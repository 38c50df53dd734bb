"""Point2point export entry (reference export/export_p2p.py analog)."""

from __future__ import annotations

from .export import Export

__all__ = ["ExportP2P"]


class ExportP2P(Export):

    def __init__(self, problem, options=None):
        Export.__init__(self, problem, options)

    def run(self, runner=None):
        """Export the embedded runtime.  ``runner`` may be a prebuilt
        BatchedP2PRunner; otherwise one is created."""
        if runner is None:
            from ..problems.batch import BatchedP2PRunner
            import jax.numpy as jnp
            runner = BatchedP2PRunner(self.problem, dtype=jnp.float64)
        return self.export(runner)
