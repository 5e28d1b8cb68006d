"""Second-round transpose probes (VERDICT r2 item 1: the XLA volume
transposes sit ~2.5x over their HBM bound).

Questions:
  (a) is the int8 minor-swap transpose (W,D,H)->(H,D,W) faster per BYTE
      than int16 (i.e., is it bandwidth- or relayout-bound)?
  (b) are MAJOR-swap transposes ((W,D,H)->(D,W,H): lanes unchanged, pure
      block copy) near bandwidth? If so, a 3-pass chain
      major-swap -> per-d Pallas 2D MXU transpose -> major-swap could beat
      one minor-swap despite moving 3x the data.
  (c) does the per-d 2D MXU one-hot transpose legalize at all (the direct
      3D and 2D-loop Mosaic forms do not — scripts/probe_transpose.py)?

Timing: slope method inside one program (lax.map over salts), iota-weighted
fence so XLA cannot DCE the transpose (sum commutes with permutations).
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W, D, H = 768, 64, 540
K_SMALL, K_BIG, REPEATS = 4, 16, 9


def pallas_transpose_2d_mxu(vol_dwh):
    """(D, W, H) -> (D, H, W): per-d 2D transpose as a bf16 one-hot matmul
    on 128x128-ish tiles. Exact for integer values <= 127 (int8 volumes).
    W=768 and H=540: tile H by 108 (540 = 5 * 108; 108 % 8 == 0... it is
    not % 128 but the LAST block dim must be lanes -> use full-H blocks and
    tile W only."""
    d, w, h = vol_dwh.shape
    BW = 128

    def kernel(in_ref, out_ref):
        x = in_ref[0].astype(jnp.float32)  # (BW, H)
        xb = x.astype(jnp.bfloat16)
        eye = jnp.eye(BW, dtype=jnp.bfloat16)
        # out[a, b] = x[b, a] = sum_k x[k, a] * eye[k, b]
        y = jax.lax.dot_general(
            xb, eye, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (H, BW)
        out_ref[0] = y.astype(out_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(d, w // BW),
        in_specs=[pl.BlockSpec((1, BW, h), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, BW), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, h, w), vol_dwh.dtype),
    )(vol_dwh)


def time_fn(name, f, vol):
    def run_k(k):
        @jax.jit
        def prog():
            def body(s):
                t = f(vol + s.astype(vol.dtype))
                wgt = jax.lax.broadcasted_iota(jnp.int32, t.shape, t.ndim - 1) % 3
                return (t.astype(jnp.int32) * wgt).sum()
            return jnp.sum(lax.map(body, jnp.arange(1, k + 1, dtype=jnp.int32)))
        return prog

    ps, pb = run_k(K_SMALL), run_k(K_BIG)
    try:
        float(ps()); float(pb())
    except Exception as e:
        print(f"{name:32s} FAILS {str(e).splitlines()[0][:90]}", flush=True)
        return
    ts, tb = [], []
    for _ in range(REPEATS):
        t0 = time.perf_counter(); float(ps()); ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(pb()); tb.append(time.perf_counter() - t0)
    ms = (statistics.median(tb) - statistics.median(ts)) / (K_BIG - K_SMALL) * 1e3
    nbytes = vol.size * vol.dtype.itemsize
    gbps = 2 * nbytes / (ms * 1e-3) / 1e9 if ms > 0 else float("inf")
    print(f"{name:32s} {ms:7.3f} ms  ({gbps:6.1f} GB/s rw)", flush=True)


rng = np.random.default_rng(0)
v8 = jnp.asarray(rng.integers(0, 70, (W, D, H)), jnp.int8)
v16 = jnp.asarray(rng.integers(0, 280, (W, D, H)), jnp.int16)

# correctness of the MXU transpose first
try:
    got = pallas_transpose_2d_mxu(jnp.transpose(v8, (1, 0, 2)))
    want = jnp.transpose(v8, (1, 2, 0))
    print("mxu 2d transpose correct:",
          bool(jnp.array_equal(got, want)), flush=True)
except Exception as e:
    print("mxu 2d transpose FAILS:", str(e).splitlines()[0][:120], flush=True)

time_fn("minor_swap_int16 (2,1,0)", lambda v: jnp.transpose(v, (2, 1, 0)), v16)
time_fn("minor_swap_int8  (2,1,0)", lambda v: jnp.transpose(v, (2, 1, 0)), v8)
time_fn("major_swap_int8  (1,0,2)", lambda v: jnp.transpose(v, (1, 0, 2)), v8)
time_fn("chain_int8 maj+mxu+maj",
        lambda v: jnp.transpose(
            pallas_transpose_2d_mxu(jnp.transpose(v, (1, 0, 2))), (1, 0, 2)
        ), v8)
time_fn("minor_swap_int8 again", lambda v: jnp.transpose(v, (2, 1, 0)), v8)
