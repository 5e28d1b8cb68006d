"""Isolate which part of the (W,D,H) builder fails Mosaic legalization.

Variants:
  v0: interpret-mode full design (logic check, CPU)
  v1: resident full-array input, STATIC slice starts (start = r only)
  v2: resident input, start = nblocks-derived but loop-static per block
      (start computed from program_id) -- the dynamic sublane slice
  v3: like v2 but slicing via pl.load on a scratch copy
"""

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"
)

import jax
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W, D = 540, 768, 64
ROWS = 8


def make(kind, interpret=False):
    def kernel(cl_ref, crev_ref, out_ref):
        i = pl.program_id(0)
        for r in range(ROWS):
            if kind == "static":
                start = r * 3  # static
                slab = crev_ref[pl.ds(start, D), :]
            else:
                start = (W - 1) - (i * ROWS + r)  # dynamic in program_id
                slab = crev_ref[pl.ds(start, D), :]
            cl = cl_ref[r][None, :]
            out_ref[r] = (cl ^ slab).astype(jnp.int32)

    @jax.jit
    def build(cl_t, crev):
        w, h = cl_t.shape
        return pl.pallas_call(
            kernel,
            grid=(w // ROWS,),
            in_specs=[
                pl.BlockSpec((ROWS, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(crev.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (ROWS, D, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((w, D, h), jnp.int32),
            interpret=interpret,
        )(cl_t, crev)

    return build


def main():
    rng = np.random.default_rng(0)
    cl_t = jnp.asarray(rng.integers(0, 2**31, size=(W, H), dtype=np.int32))
    crev = jnp.asarray(
        rng.integers(0, 2**31, size=(W + D, H), dtype=np.int32)
    )
    for kind in ("static", "dynamic"):
        try:
            out = np.asarray(make(kind)(cl_t, crev))
            print(f"{kind}: OK shape={out.shape} sum={out.sum() & 0xffff}")
        except Exception as e:  # noqa: BLE001
            msg = str(e).replace("\n", " | ")[:300]
            print(f"{kind}: FAIL {type(e).__name__}: {msg}")


if __name__ == "__main__":
    main()
