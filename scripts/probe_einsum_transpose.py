"""Probe: XLA-level einsum-identity MXU transpose for the int8 raw-volume
relayout, A/B'd in the full two-view pipeline.

Context (CLAUDE.md perf state): the two XLA volume transposes sit ~2.5x over
their HBM bound; Pallas transposes don't legalize (probe_transpose.py), and
the Pallas per-d one-hot MXU chain loses in-pipeline
(probe_mxu_transpose_pipeline.py: 2.19 vs 1.98). NOT yet tried: keeping the
whole thing in XLA as a dot against identity —

    out[b, d, a] = sum_a' vol[a', d, b] * I[a', a]
    = dot_general(vol, eye, contract lhs 0 with rhs 0)  -> (d, b, a)
    + one major-axis swap (d, b, a) -> (b, d, a)         (minor axis intact)

For int8 volumes the dot can ride the int8 MXU (s8 x s8 -> s32); the
major-axis swap preserves the lane dimension so it should run near
bandwidth. Fence sums must match exactly (identity contraction is exact).

Variants:
  xla          jnp.transpose (baseline, both call sites)
  einsum_i8    einsum dot for int8 volumes only, XLA transpose for int16 sums
  einsum_both  einsum dot for int8 + hi/lo-split bf16 dots for int16
"""

import functools
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from jax import lax

import stereovisionarray_tpu.ops.sgm_pallas as SP
from stereovisionarray_tpu.config import CostConfig, SGMConfig
from stereovisionarray_tpu.models.two_view import two_view_disparity

H, W, D = 540, 768, 64
K_SMALL, K_BIG, REPEATS = 4, 16, 9


def _einsum_t(vol):
    """(A, D, B) -> (B, D, A) via dot against identity + major swap."""
    a, d, b = vol.shape
    if vol.dtype == jnp.int8:
        eye = jnp.eye(a, dtype=jnp.int8)
        dbx = lax.dot_general(
            vol, eye, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (d, b, a_new) in s32
        return jnp.transpose(dbx, (1, 0, 2)).astype(jnp.int8)
    raise TypeError(vol.dtype)


def _einsum_t_i16(vol):
    """int16 (A, D, B) -> (B, D, A): hi/lo byte split, two bf16 dots
    (each byte is bf16-exact), recombined in s32."""
    a, d, b = vol.shape
    lo = (vol & 255).astype(jnp.bfloat16)  # 0..255 exact in bf16
    hi = (vol >> 8).astype(jnp.bfloat16)  # -128..127 exact
    eye = jnp.eye(a, dtype=jnp.bfloat16)
    f = lambda x: lax.dot_general(
        x, eye, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(jnp.int32)
    dbx = (f(hi) << 8) + f(lo)
    return jnp.transpose(dbx, (1, 0, 2)).astype(jnp.int16)


def t_i8_only(vol, interpret: bool = False):
    del interpret
    if vol.dtype == jnp.int8:
        return _einsum_t(vol)
    return jnp.transpose(vol, (2, 1, 0))


def t_both(vol, interpret: bool = False):
    del interpret
    if vol.dtype == jnp.int8:
        return _einsum_t(vol)
    if vol.dtype == jnp.int16:
        return _einsum_t_i16(vol)
    return jnp.transpose(vol, (2, 1, 0))


rng = np.random.default_rng(0)
base = rng.uniform(0.0, 255.0, size=(H, W + 32)).astype(np.float32)
left = jnp.asarray(base[..., :W])
right = jnp.asarray(base[..., 32:])
cc8 = CostConfig(num_disparities=D, census_window=(7, 9), dtype="int8")
sgm_cfg = SGMConfig(p1=8.0, p2=96.0, num_paths=8, adaptive_p2=True)
_orig = SP.transpose_hdw


def run_variant(name, impl):
    SP.transpose_hdw = impl
    jax.clear_caches()

    def full(s):
        return two_view_disparity(left + s, right, cc8, sgm_cfg).disparity.sum()

    def run_k(k):
        @jax.jit
        def prog():
            return jnp.sum(lax.map(full, jnp.arange(1, k + 1, dtype=jnp.float32)))
        return prog

    ps, pb = run_k(K_SMALL), run_k(K_BIG)
    r_small = float(ps()); r_big = float(pb())
    ts, tb = [], []
    for _ in range(REPEATS):
        t0 = time.perf_counter(); float(ps()); ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(pb()); tb.append(time.perf_counter() - t0)
    ms = (statistics.median(tb) - statistics.median(ts)) / (K_BIG - K_SMALL) * 1e3
    print(f"{name:12s} {ms:.3f} ms/frame  (fence sums {r_small:.0f}/{r_big:.0f})",
          flush=True)
    return r_small, r_big


try:
    a = run_variant("xla", _orig)
    b = run_variant("einsum_i8", t_i8_only)
    assert a == b, (a, b)
    c = run_variant("einsum_both", t_both)
    assert a == c, (a, c)
    # interleave repeats to separate drift from signal
    run_variant("xla", _orig)
    run_variant("einsum_i8", t_i8_only)
    run_variant("einsum_both", t_both)
finally:
    SP.transpose_hdw = _orig
