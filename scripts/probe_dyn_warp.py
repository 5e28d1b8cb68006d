"""Mosaic legality probe for the translation-warp plane-sweep kernel.

The kernel needs, per (plane, view), a (h', w') window of a VMEM-resident
padded source at a DATA-DEPENDENT integer offset (y0, x0) plus a bilinear
lerp with scalar weights. probe_dynamic_slab2 established that a sublane
slice start derived from program_id crashes the v5e compiler; this probes
the remaining mechanisms:

  a_sub_smem   dynamic SUBLANE slice, start read from an SMEM scalar ref
  b_lane_roll  pltpu.roll with a TRACED (SMEM-scalar) lane shift (the
               dynamic_rotate op), then a static lane slice
  c_combined   both: y via dynamic sublane slice, x via dynamic lane
               rotate + static slice, then scalar-weight lerp
  d_iota_gate  in-kernel scalar f32 broadcast compare (the ok mask)

Each variant checks numerics against numpy on 32-bit floats.
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

HP, WP = 344, 464  # padded source (sublane, lane)
H, W = 270, 360


def run(kind):
    def kernel(y0_ref, x0_ref, f_ref, src_ref, out_ref):
        y0 = y0_ref[0]
        x0 = x0_ref[0]
        if kind == "a_sub_smem":
            out_ref[:] = src_ref[pl.ds(y0, H), :W]
        elif kind == "b_lane_roll":
            rolled = pltpu.roll(src_ref[:H], WP - 7, axis=1)  # static ok
            dyn = pltpu.roll(src_ref[:H], WP - x0, axis=1)
            out_ref[:] = dyn[:, :W] + rolled[:, :W] * 0.0
        elif kind == "c_combined":
            fu = f_ref[0]
            fv = f_ref[1]
            sl = src_ref[pl.ds(y0, H + 1)]
            sl = pltpu.roll(sl, WP - x0, axis=1)[:, : W + 1]
            top = sl[:H, :W] * (1.0 - fu) + sl[:H, 1:] * fu
            bot = sl[1:, :W] * (1.0 - fu) + sl[1:, 1:] * fu
            out_ref[:] = top * (1.0 - fv) + bot * fv
        else:  # d_iota_gate
            fu = f_ref[0]
            u = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
            out_ref[:] = jnp.where(u + fu > 5.0, src_ref[:H, :W], 0.0)

    @jax.jit
    def go(y0, x0, f, src):
        return pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
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
    if kind == "a_sub_smem":
        want = src[y0 : y0 + H, :W]
    elif kind == "b_lane_roll":
        want = np.roll(src[:H], -x0, axis=1)[:, :W]
    elif kind == "c_combined":
        sl = np.roll(src[y0 : y0 + H + 1], -x0, axis=1)[:, : W + 1]
        top = sl[:H, :W] * (1 - fu) + sl[:H, 1:] * fu
        bot = sl[1:, :W] * (1 - fu) + sl[1:, 1:] * fu
        want = top * (1 - fv) + bot * fv
    else:
        u = np.arange(W)[None].repeat(H, 0).astype(np.float32)
        want = np.where(u + fu > 5.0, src[:H, :W], 0.0)
    err = np.abs(out - want).max()
    print(f"{kind}: OK max_err={err:.2e}")


def main():
    for kind in ("a_sub_smem", "b_lane_roll", "c_combined", "d_iota_gate"):
        try:
            run(kind)
        except Exception as e:  # noqa: BLE001
            msg = str(e).replace("\n", " | ")[:260]
            print(f"{kind}: FAIL {type(e).__name__}: {msg}")


if __name__ == "__main__":
    main()
