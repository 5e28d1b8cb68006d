"""Probe: bilinear translation warp as two banded one-hot MATMULS.

Every dynamic-offset mechanism (vector slice, lane rotate, DMA) crashes
the v5e remote compiler (probe_dma_warp2.py), but a uniform-shift bilinear
warp is also expressible with ZERO dynamic offsets:

    warped = Wy @ src @ Wx
    Wy[i, p] = (p == y0 + i) (1 - fv) + (p == y0 + i + 1) fv
    Wx[p, j] = (p == x0 + j) (1 - fu) + (p == x0 + j + 1) fu

Both band matrices build in-kernel from broadcasted_iota + SMEM scalars
(all legal ops), and the contractions ride the MXU. This probes
  m_build    band construction only
  m_warp     full warp, checked against the XLA _shift_warp oracle
  m_grid     a 64-step grid with per-step scalars from an SMEM array
             indexed by program_id (the plane-sweep usage pattern)
and times m_grid per step.
"""

import functools
import os
import statistics
import sys
import time

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

HP, WP = 368, 458  # padded source dims (deliberately unaligned)
H, W = 270, 360
D = 64  # grid steps for m_grid


def _bands(y0, x0, fu, fv, h, w, hp, wp):
    ip = jax.lax.broadcasted_iota(jnp.int32, (h, hp), 1)
    ii = jax.lax.broadcasted_iota(jnp.int32, (h, hp), 0)
    t = y0 + ii
    wy = jnp.where(ip == t, 1.0 - fv, 0.0) + jnp.where(ip == t + 1, fv, 0.0)
    jp = jax.lax.broadcasted_iota(jnp.int32, (wp, w), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (wp, w), 1)
    s = x0 + jj
    wx = jnp.where(jp == s, 1.0 - fu, 0.0) + jnp.where(jp == s + 1, fu, 0.0)
    return wy, wx


def run(kind):
    rng = np.random.default_rng(0)
    src = rng.uniform(0, 255, (HP, WP)).astype(np.float32)

    if kind in ("m_build", "m_warp"):
        def kernel(sc_ref, f_ref, src_ref, out_ref):
            y0 = sc_ref[0]
            x0 = sc_ref[1]
            fv = f_ref[0]
            fu = f_ref[1]
            wy, wx = _bands(y0, x0, fu, fv, H, W, HP, WP)
            if kind == "m_build":
                out_ref[:] = wy[:, :W] + wx[:H]
            else:
                t = jax.lax.dot_general(
                    wy, src_ref[:],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                out_ref[:] = jax.lax.dot_general(
                    t, wx, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

        @jax.jit
        def go(sc, f, s):
            return pl.pallas_call(
                kernel,
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
            )(sc, f, s)

        y0, x0, fu, fv = 37, 11, 0.25, 0.625
        out = np.asarray(go(
            jnp.asarray([y0, x0], jnp.int32),
            jnp.asarray([fv, fu], jnp.float32),
            jnp.asarray(src),
        ))
        if kind == "m_build":
            print(f"{kind}: OK (compiled; sum={out.sum():.3f})")
            return
        sl = src[y0 : y0 + H + 1, x0 : x0 + W + 1]
        top = sl[:H, :W] * (1 - fu) + sl[:H, 1:] * fu
        bot = sl[1:, :W] * (1 - fu) + sl[1:, 1:] * fu
        want = top * (1 - fv) + bot * fv
        err = np.abs(out - want).max()
        print(f"{kind}: OK max_err={err:.2e}")
        return

    # m_grid: one warp per grid step, scalars indexed by program_id
    def kernel(sc_ref, f_ref, src_ref, out_ref):
        i = pl.program_id(0)
        y0 = sc_ref[i, 0]
        x0 = sc_ref[i, 1]
        fv = f_ref[i, 0]
        fu = f_ref[i, 1]
        wy, wx = _bands(y0, x0, fu, fv, H, W, HP, WP)
        t = jax.lax.dot_general(
            wy, src_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0] = jax.lax.dot_general(
            t, wx, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @jax.jit
    def go(sc, f, s):
        return pl.pallas_call(
            kernel,
            grid=(D,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((HP, WP), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, H, W), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((D, H, W), jnp.float32),
        )(sc, f, s)

    rng2 = np.random.default_rng(1)
    ys = rng2.integers(0, HP - H - 1, D)
    xs = rng2.integers(0, WP - W - 1, D)
    fs = rng2.uniform(0, 1, (D, 2)).astype(np.float32)
    sc = jnp.asarray(np.stack([ys, xs], -1), jnp.int32)
    f = jnp.asarray(fs)
    out = np.asarray(go(sc, f, jnp.asarray(src)))
    d = D - 1
    sl = src[ys[d] : ys[d] + H + 1, xs[d] : xs[d] + W + 1]
    fv, fu = fs[d]
    top = sl[:H, :W] * (1 - fu) + sl[:H, 1:] * fu
    bot = sl[1:, :W] * (1 - fu) + sl[1:, 1:] * fu
    want = top * (1 - fv) + bot * fv
    err = np.abs(out[d] - want).max()
    print(f"{kind}: OK max_err={err:.2e}")

    # timing: slope over grid reuse (K dispatches inside one jit)
    from jax import lax

    def run_k(k):
        @jax.jit
        def prog(s):
            def one(salt):
                return jnp.sum(go(sc, f, s + salt))
            return jnp.sum(lax.map(one, jnp.arange(1.0, k + 1.0)))
        return prog

    s_dev = jax.device_put(jnp.asarray(src))
    p4, p16 = run_k(4), run_k(16)
    float(p4(s_dev)); float(p16(s_dev))
    t4, t16 = [], []
    for _ in range(7):
        t0 = time.perf_counter(); float(p4(s_dev)); t4.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(p16(s_dev)); t16.append(time.perf_counter() - t0)
    ms = (statistics.median(t16) - statistics.median(t4)) / 12 * 1e3
    print(f"m_grid: {ms:.3f} ms per {D}-warp call "
          f"({ms / D * 1e3:.1f} us/warp)")


def run_exact():
    """hi/lo-split EXACT gather: one-hot 0/1 selections are bf16-exact, and
    src = f32(hi) + f32(lo) splits exactly, so two bf16 matmuls per axis
    reproduce the f32 gather bit-for-bit; the fractional bilinear lerp then
    runs on the VPU in f32 — bit-identical to _shift_warp in the interior."""
    rng = np.random.default_rng(0)
    src = rng.uniform(0, 255, (HP, WP)).astype(np.float32)

    def kernel(sc_ref, f_ref, hi_ref, lo_ref, out_ref):
        i = pl.program_id(0)
        y0 = sc_ref[i, 0]
        x0 = sc_ref[i, 1]
        fv = f_ref[i, 0]
        fu = f_ref[i, 1]
        # row selection: rows y0 + r for r in 0..H (H+1 contiguous rows)
        rp = jax.lax.broadcasted_iota(jnp.int32, (H + 1, HP), 1)
        rr = jax.lax.broadcasted_iota(jnp.int32, (H + 1, HP), 0)
        sy = (rp == y0 + rr).astype(jnp.bfloat16)
        dot = functools.partial(
            jax.lax.dot_general,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        a = dot(sy, hi_ref[:]) + dot(sy, lo_ref[:])  # (H+1, WP) exact f32
        # column selection: cols x0 + c for c in 0..W
        cp = jax.lax.broadcasted_iota(jnp.int32, (WP, W + 1), 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, (WP, W + 1), 1)
        sx = (cp == x0 + cc).astype(jnp.bfloat16)
        a_hi = a.astype(jnp.bfloat16)
        a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        b = dot(a_hi, sx) + dot(a_lo, sx)  # (H+1, W+1) exact f32
        top = b[:H, :W] * (1.0 - fu) + b[:H, 1:] * fu
        bot = b[1:, :W] * (1.0 - fu) + b[1:, 1:] * fu
        out_ref[0] = top * (1.0 - fv) + bot * fv

    @jax.jit
    def go(sc, f, hi, lo):
        return pl.pallas_call(
            kernel,
            grid=(D,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((HP, WP), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((HP, WP), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, H, W), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((D, H, W), jnp.float32),
        )(sc, f, hi, lo)

    rng2 = np.random.default_rng(1)
    ys = rng2.integers(0, HP - H - 1, D)
    xs = rng2.integers(0, WP - W - 1, D)
    fs = rng2.uniform(0, 1, (D, 2)).astype(np.float32)
    sc = jnp.asarray(np.stack([ys, xs], -1), jnp.int32)
    f = jnp.asarray(fs)
    s32 = jnp.asarray(src)
    hi = s32.astype(jnp.bfloat16)
    lo = (s32 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    out = np.asarray(go(sc, f, hi, lo))
    errs = []
    for d in range(0, D, 17):
        sl = src[ys[d] : ys[d] + H + 1, xs[d] : xs[d] + W + 1]
        fv, fu = fs[d]
        top = sl[:H, :W] * (1 - fu) + sl[:H, 1:] * fu
        bot = sl[1:, :W] * (1 - fu) + sl[1:, 1:] * fu
        want = (top * (1 - fv) + bot * fv).astype(np.float32)
        errs.append(np.abs(out[d] - want).max())
    print(f"m_exact: OK max_err={max(errs):.2e} (MUST be ~0)")

    from jax import lax

    def run_k(k):
        @jax.jit
        def prog(h, l):
            def one(salt):
                return jnp.sum(go(sc, f, h + salt.astype(jnp.bfloat16), l))
            return jnp.sum(lax.map(one, jnp.arange(1.0, k + 1.0)))
        return prog

    p4, p16 = run_k(4), run_k(16)
    float(p4(hi, lo)); float(p16(hi, lo))
    t4, t16 = [], []
    for _ in range(7):
        t0 = time.perf_counter(); float(p4(hi, lo)); t4.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(p16(hi, lo)); t16.append(time.perf_counter() - t0)
    ms = (statistics.median(t16) - statistics.median(t4)) / 12 * 1e3
    print(f"m_exact: {ms:.3f} ms per {D}-warp call "
          f"({ms / D * 1e3:.1f} us/warp)")


def main():
    for kind in ("m_build", "m_warp", "m_grid"):
        try:
            run(kind)
        except Exception as e:  # noqa: BLE001
            msg = str(e).replace("\n", " | ")[:240]
            print(f"{kind}: FAIL {type(e).__name__}: {msg}")
    try:
        run_exact()
    except Exception as e:  # noqa: BLE001
        msg = str(e).replace("\n", " | ")[:240]
        print(f"m_exact: FAIL {type(e).__name__}: {msg}")


if __name__ == "__main__":
    main()
