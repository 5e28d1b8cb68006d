"""A/B the full int8 two-view pipeline with the XLA minor-swap volume
transpose vs the 3-pass MXU chain (major-swap -> per-d one-hot matmul
transpose -> major-swap), monkeypatching ops.sgm_pallas.transpose_hdw.

probe_transpose2.py showed the MXU 2D transpose legalizes (first working
Pallas transpose on this toolchain) and the chain timed 0.108 vs 0.172 ms
isolated — but with anchors reading negative, only a full-pipeline
within-run A/B is trustworthy. int8 volumes ride bf16 matmuls (exact to
127); int16 sums ride f32 matmuls (exact to 2^24)."""

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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import stereovisionarray_tpu.ops.sgm_pallas as SP
from stereovisionarray_tpu.config import CostConfig, SGMConfig
from stereovisionarray_tpu.models.two_view import two_view_disparity

H, W, D = 540, 768, 64
K_SMALL, K_BIG, REPEATS = 4, 16, 9


def _mxu_2d(vol_dwh, bw=128):
    d, w, h = vol_dwh.shape
    use_bf16 = vol_dwh.dtype == jnp.int8  # values <= 127: bf16-exact

    def kernel(in_ref, out_ref):
        x = in_ref[0].astype(jnp.float32)
        if use_bf16:
            xb = x.astype(jnp.bfloat16)
            eye = jnp.eye(bw, dtype=jnp.bfloat16)
        else:
            xb = x
            eye = jnp.eye(bw, dtype=jnp.float32)
        y = jax.lax.dot_general(
            xb, eye, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0] = y.astype(out_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(d, w // bw),
        in_specs=[pl.BlockSpec((1, bw, h), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, bw), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, h, w), vol_dwh.dtype),
    )(vol_dwh)


def transpose_chain(vol, interpret=False):
    # (A, D, B) -> (B, D, A) with A on the grid-major axis
    a, d, b = vol.shape
    if interpret or a % 128 != 0:
        return jnp.transpose(vol, (2, 1, 0))
    return jnp.transpose(_mxu_2d(jnp.transpose(vol, (1, 0, 2))), (1, 0, 2))


rng = np.random.default_rng(0)
base = rng.uniform(0.0, 255.0, size=(H, W + 32)).astype(np.float32)
left = jnp.asarray(base[..., :W])
right = jnp.asarray(base[..., 32:])
cc8 = CostConfig(num_disparities=D, census_window=(7, 9), dtype="int8")
sgm_cfg = SGMConfig(p1=8.0, p2=96.0, num_paths=8, adaptive_p2=True)
_orig = SP.transpose_hdw


def run_variant(name, impl):
    SP.transpose_hdw = impl  # models/two_view imports it lazily per call
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
    b = run_variant("mxu_chain", transpose_chain)
    assert a == b, (a, b)  # identical fence sums: the chain is exact
    run_variant("xla", _orig)
    run_variant("mxu_chain", transpose_chain)
finally:
    SP.transpose_hdw = _orig
