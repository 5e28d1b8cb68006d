"""Probe: (W, D, H)-layout cost-builder primitives on real TPU Mosaic.

Two legality/perf questions gate the roll-free transposed cost builder
(out[x, d, y] = f(left_T[x], right_T[x - d])):

 1. Does a dynamic sublane-offset slice ``ref[pl.ds(start, D), :]`` with a
    program_id-derived ``start`` legalize on v5e? (The D shifted right rows
    become ONE contiguous ascending slice of a REVERSED right image — zero
    lane rolls.)
 2. Is a full-array input with a CONSTANT index map fetched once (block
    revisiting) rather than re-DMA'd every grid step? If it re-fetches,
    the ~5 MB resident set would cost ~0.5 GB of DMA per frame.

Run:  python scripts/probe_dynamic_slab.py
"""

import functools
import os
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

H, W, D = 540, 768, 64
ROWS = 8


def _kernel(cl_ref, crev_ref, out_ref, *, rows, n_disp, w):
    # crev_ref: resident (Wpad, H) reversed array, crev[k] = cr[W-1-k]
    # out[x, d, y] = cl[x, y] ^ crev[W-1-(x-d)] = crev[(W-1-x) + d]
    i = pl.program_id(0)
    for r in range(rows):
        x = i * rows + r
        start = (w - 1) - x  # dynamic: depends on program_id
        slab = crev_ref[pl.ds(start, n_disp), :]  # (D, H)
        cl = cl_ref[r][None, :]  # (1, H)
        out_ref[r] = (cl ^ slab).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def build(cl_t, crev, interpret=False):
    w, h = cl_t.shape
    nblocks = w // ROWS
    return pl.pallas_call(
        functools.partial(_kernel, rows=ROWS, n_disp=D, w=w),
        grid=(nblocks,),
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


def main():
    rng = np.random.default_rng(0)
    cl = rng.integers(0, 2**31, size=(H, W), dtype=np.int32)
    cr = rng.integers(0, 2**31, size=(H, W), dtype=np.int32)
    cl_t = jnp.asarray(cl.T)  # (W, H)
    # reversed right + D trailing pad rows (values irrelevant for x >= d)
    crev_np = np.concatenate([cr.T[::-1], np.zeros((D, H), np.int32)], axis=0)
    crev = jnp.asarray(crev_np)

    # oracle: out[x, d, y] = cl[y, x] ^ cr[y, x - d] for x >= d
    want = np.zeros((W, D, H), np.int32)
    for d in range(D):
        want[d:, d, :] = (cl[:, d:] ^ cr[:, : W - d]).T

    try:
        got = np.asarray(build(cl_t, crev))
    except Exception as e:  # noqa: BLE001
        print(f"DYNAMIC-SLAB BUILD FAILED: {type(e).__name__}: {str(e)[:500]}")
        return
    mask = np.zeros((W, D, H), bool)
    for d in range(D):
        mask[d:, d, :] = True
    ok = np.array_equal(got[mask], want[mask])
    print(f"correct (x>=d region): {ok}")
    if not ok:
        bad = np.argwhere((got != want) & mask)
        print(f"first mismatches: {bad[:5]}")
        return

    # crude timing: slope between K=4 and K=16 maps (tunnel-safe)
    from jax import lax

    def run_k(k):
        @jax.jit
        def prog():
            salts = jnp.arange(1, k + 1, dtype=jnp.int32)
            def f(s):
                return build(cl_t + s, crev).sum()
            return jnp.sum(lax.map(f, salts))
        return prog

    ps, pb = run_k(4), run_k(16)
    float(ps()); float(pb())
    ts, tb = [], []
    for _ in range(7):
        t0 = time.perf_counter(); float(ps()); ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(pb()); tb.append(time.perf_counter() - t0)
    import statistics
    ms = (statistics.median(tb) - statistics.median(ts)) / 12 * 1e3
    # volume write alone = W*D*H*4B = 106 MB -> ~0.13 ms at SOL; if the
    # resident crev (2.7 MB) re-fetched every one of the 96 grid steps,
    # that adds ~260 MB -> the number tells us which world we're in
    print(f"xor-slab builder: {ms:.3f} ms/call  (SOL write-only ~0.13)")


if __name__ == "__main__":
    main()
