"""Bisect the universal HTTP-500 from probe_dma_warp/probe_dyn_warp.

Controls:
  h_plain       VMEM in -> VMEM out copy, no SMEM, no DMA (sanity)
  i_smem_add    SMEM scalar input, out = src + scalar (is SMEM the issue?)
  j_static_dma  ANY-space input, STATIC-offset make_async_copy
  k_dyn_dma     like j but the sublane offset comes from an SMEM scalar
  l_grid_smem   same as i but with a 1D grid (blocked specs)
"""

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

HP, WP = 344, 512
H, W = 256, 384


def run(kind):
    rng = np.random.default_rng(0)
    src = rng.uniform(0, 255, (HP, WP)).astype(np.float32)
    y0 = 37

    if kind == "h_plain":
        def kernel(src_ref, out_ref):
            out_ref[:] = src_ref[:H, :W] * 2.0

        @jax.jit
        def go(s):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
            )(s)

        out = np.asarray(go(jnp.asarray(src)))
        want = src[:H, :W] * 2.0
    elif kind == "i_smem_add":
        def kernel(c_ref, src_ref, out_ref):
            out_ref[:] = src_ref[:H, :W] + c_ref[0]

        @jax.jit
        def go(c, s):
            return pl.pallas_call(
                kernel,
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
            )(c, s)

        out = np.asarray(go(jnp.asarray([3.0], jnp.float32), jnp.asarray(src)))
        want = src[:H, :W] + 3.0
    elif kind == "j_static_dma":
        def kernel(src_ref, out_ref, scratch, sem):
            cp = pltpu.make_async_copy(
                src_ref.at[pl.ds(32, H), pl.ds(0, W)], scratch, sem
            )
            cp.start()
            cp.wait()
            out_ref[:] = scratch[:]

        @jax.jit
        def go(s):
            return pl.pallas_call(
                kernel,
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
                scratch_shapes=[
                    pltpu.VMEM((H, W), jnp.float32),
                    pltpu.SemaphoreType.DMA,
                ],
            )(s)

        out = np.asarray(go(jnp.asarray(src)))
        want = src[32 : 32 + H, :W]
    elif kind == "k_dyn_dma":
        def kernel(y_ref, src_ref, out_ref, scratch, sem):
            cp = pltpu.make_async_copy(
                src_ref.at[pl.ds(y_ref[0], H), pl.ds(0, W)], scratch, sem
            )
            cp.start()
            cp.wait()
            out_ref[:] = scratch[:]

        @jax.jit
        def go(y, s):
            return pl.pallas_call(
                kernel,
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
                scratch_shapes=[
                    pltpu.VMEM((H, W), jnp.float32),
                    pltpu.SemaphoreType.DMA,
                ],
            )(y, s)

        out = np.asarray(go(jnp.asarray([y0], jnp.int32), jnp.asarray(src)))
        want = src[y0 : y0 + H, :W]
    else:  # l_grid_smem
        def kernel(c_ref, src_ref, out_ref):
            out_ref[:] = src_ref[:] + c_ref[0]

        @jax.jit
        def go(c, s):
            return pl.pallas_call(
                kernel,
                grid=(2,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec((H // 2, W), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((H // 2, W), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
            )(c, s)

        out = np.asarray(go(jnp.asarray([3.0], jnp.float32),
                            jnp.asarray(src[:H, :W])))
        want = src[:H, :W] + 3.0
    err = np.abs(out - want).max()
    print(f"{kind}: OK max_err={err:.2e}")


def main():
    for kind in ("h_plain", "i_smem_add", "j_static_dma", "k_dyn_dma",
                 "l_grid_smem"):
        try:
            run(kind)
        except Exception as e:  # noqa: BLE001
            msg = str(e).replace("\n", " | ")[:220]
            print(f"{kind}: FAIL {type(e).__name__}: {msg}")


if __name__ == "__main__":
    main()
