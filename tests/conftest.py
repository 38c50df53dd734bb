import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware (the driver separately dry-runs them).
#
# NOTE: this environment pre-imports jax via sitecustomize and pins
# JAX_PLATFORMS=axon (the TPU tunnel), so plain env-var defaults are too
# late -- override through jax.config before any backend is initialized.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: repeat suite runs (and repeated problem
# shapes within one run) skip XLA compilation entirely
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass
# host/CI tests run in f64 (like the CPU simulation path); float32 behavior
# (the TPU path) is exercised by dedicated f32 solver tests and the bench
jax.config.update("jax_enable_x64", True)
