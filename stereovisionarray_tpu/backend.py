"""Compute-backend resolution shared by the single-chip models and the
sharded (shard_map) pipelines.

``"auto"`` picks the Pallas fused kernels on TPU-family backends and the
pure-XLA path elsewhere (cpu/gpu). CPU tests exercise the Pallas path
explicitly via interpret mode (``tests/test_sgm_pallas.py``). One
definition so single-chip and sharded paths can never resolve
differently (they share the same rule by construction).
"""

import jax

__all__ = ["resolve_backend"]


def resolve_backend(backend: str) -> str:
    if backend != "auto":
        return backend
    return "pallas" if jax.default_backend() not in ("cpu", "gpu") else "xla"
