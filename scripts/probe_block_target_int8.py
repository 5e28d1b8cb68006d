"""Within-run A/B of the sweep block-row target on the int8 full pipeline.

Round-2 tuned target=12 on the int16 pipeline; int8 halves the volume-read
bytes per block, shifting the DMA/compute balance — re-probe 12/15/18/20/27
(divisors of both 540 and/or 768 where relevant; _block_rows picks the
largest divisor <= target per axis)."""
import os, statistics, sys, time
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
rng = np.random.default_rng(0)
base = rng.uniform(0.0, 255.0, size=(H, W + 32)).astype(np.float32)
left = jnp.asarray(base[..., :W]); right = jnp.asarray(base[..., 32:])
sgm_cfg = SGMConfig(p1=8.0, p2=96.0, num_paths=8, adaptive_p2=True)
cc8 = CostConfig(num_disparities=D, census_window=(7, 9), dtype="int8")

def run_k(f, k):
    @jax.jit
    def prog():
        return jnp.sum(lax.map(f, jnp.arange(1, k + 1, dtype=jnp.float32)))
    return prog

for target in (27, 12, 27, 12):
    SP._BLOCK_TARGET = target
    # the outer two_view_disparity jit would cache-hit across targets (the
    # block size is a module global, not a static arg) — drop live caches;
    # the persistent disk cache still serves recompiles per distinct program
    jax.clear_caches()
    def full(s):
        return two_view_disparity(left + s + target * 1e-4, right, cc8, sgm_cfg).disparity.sum()
    ps, pb = run_k(full, K_SMALL), run_k(full, K_BIG)
    float(ps()); float(pb())
    ts, tb = [], []
    for _ in range(REPEATS):
        t0 = time.perf_counter(); float(ps()); ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(pb()); tb.append(time.perf_counter() - t0)
    ms = (statistics.median(tb) - statistics.median(ts)) / (K_BIG - K_SMALL) * 1e3
    print(f"target {target:3d}: {ms:.3f} ms/frame", flush=True)
