"""Device helpers: route one-time host-side precomputation (structure
detection, affine tensor builds, row scaling) to the CPU backend even when
the default platform is a TPU with slow remote compilation."""

from __future__ import annotations

import contextlib

import jax

__all__ = ["host_device", "on_host", "enable_host_backend"]


def enable_host_backend():
    """Make the CPU backend available alongside the pinned platform.  Must
    run before backend initialization to have any effect; safe to call
    late (no-op)."""
    try:
        platforms = jax.config.jax_platforms
        if platforms and "cpu" not in platforms:
            jax.config.update("jax_platforms", platforms + ",cpu")
    except Exception:
        pass


def host_device():
    # local_devices, not devices: under multi-host (jax.distributed) the
    # global device list starts with host 0's devices, whose values are
    # non-addressable from every other process
    try:
        return jax.local_devices(backend="cpu")[0]
    except Exception:
        return None


@contextlib.contextmanager
def on_host():
    """Run traced computations on the CPU backend when available."""
    dev = host_device()
    if dev is None:
        yield False
        return
    with jax.default_device(dev):
        yield True
