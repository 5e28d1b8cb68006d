"""Probe: dynamic-offset DMA (HBM -> VMEM scratch) for the warp window.

Vector-unit dynamic slices crash the v5e Mosaic compiler in every form
(probe_dyn_warp.py: SMEM-scalar sublane starts, dynamic lane rotates, all
HTTP-500 the remote compiler). DMAs are memory descriptors, not vector
ops — paged-attention kernels use dynamic page indices routinely — so the
translation warp may still be feasible by copying the (h+1, w+1) window
at a data-dependent (y0, x0) from an ANY-space (HBM) ref into VMEM
scratch with pltpu.make_async_copy, then lerping statically.

  e_dma_sub    dynamic start on the SUBLANE axis only
  f_dma_both   dynamic start on both axes (lane offset x0 included)
  g_warp       full bilinear warp: DMA window + scalar-weight lerp
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

HP, WP = 344, 464
H, W = 256, 384


def run(kind):
    def kernel(y0_ref, x0_ref, f_ref, src_ref, out_ref, scratch, sem):
        y0 = y0_ref[0]
        x0 = x0_ref[0]
        if kind == "e_dma_sub":
            cp = pltpu.make_async_copy(
                src_ref.at[pl.ds(y0, H), pl.ds(0, W)], scratch.at[:H, :W], sem
            )
            cp.start()
            cp.wait()
            out_ref[:] = scratch[:H, :W]
        elif kind == "f_dma_both":
            cp = pltpu.make_async_copy(
                src_ref.at[pl.ds(y0, H), pl.ds(x0, W)], scratch.at[:H, :W], sem
            )
            cp.start()
            cp.wait()
            out_ref[:] = scratch[:H, :W]
        else:  # g_warp
            fu = f_ref[0]
            fv = f_ref[1]
            cp = pltpu.make_async_copy(
                src_ref.at[pl.ds(y0, H + 1), pl.ds(x0, W + 1)], scratch, sem
            )
            cp.start()
            cp.wait()
            top = scratch[:H, :W] * (1.0 - fu) + scratch[:H, 1:] * fu
            bot = scratch[1:, :W] * (1.0 - fu) + scratch[1:, 1:] * fu
            out_ref[:] = top * (1.0 - fv) + bot * fv

    @jax.jit
    def go(y0, x0, f, src):
        return pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((H + 1, W + 1), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )(y0, x0, f, src)

    rng = np.random.default_rng(0)
    src = rng.uniform(0, 255, (HP, WP)).astype(np.float32)
    y0, x0 = 37, 11
    fu, fv = 0.25, 0.625
    out = np.asarray(
        go(
            jnp.asarray([y0], jnp.int32),
            jnp.asarray([x0], jnp.int32),
            jnp.asarray([fu, fv], jnp.float32),
            jnp.asarray(src),
        )
    )
    if kind == "e_dma_sub":
        want = src[y0 : y0 + H, :W]
    elif kind == "f_dma_both":
        want = src[y0 : y0 + H, x0 : x0 + W]
    else:
        sl = src[y0 : y0 + H + 1, x0 : x0 + W + 1]
        top = sl[:H, :W] * (1 - fu) + sl[:H, 1:] * fu
        bot = sl[1:, :W] * (1 - fu) + sl[1:, 1:] * fu
        want = top * (1 - fv) + bot * fv
    err = np.abs(out - want).max()
    print(f"{kind}: OK max_err={err:.2e}")


def main():
    for kind in ("e_dma_sub", "f_dma_both", "g_warp"):
        try:
            run(kind)
        except Exception as e:  # noqa: BLE001
            msg = str(e).replace("\n", " | ")[:260]
            print(f"{kind}: FAIL {type(e).__name__}: {msg}")


if __name__ == "__main__":
    main()
