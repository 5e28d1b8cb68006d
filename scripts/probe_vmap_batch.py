"""lax.map vs jax.vmap over the fused two-view chain (540x768x64, int16).

lax.map traces the chain once and executes frames SEQUENTIALLY — each
frame pays every kernel's fixed cost (grid setup, prologue DMA ramp).
jax.vmap folds the frame axis into each pallas_call's grid (one kernel
launch per stage for the whole batch); interpret-mode equality with the
per-frame chain is checked in tests. This probes whether the fold is
worth adopting in bench.py / serving.

Slope method: ms/frame = (T(K=16) - T(K=4)) / 12.
"""

import argparse
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"
)

H, W, D = 540, 768, 64
K_SMALL, K_BIG = 4, 16


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--repeats", type=int, default=9)
    args = parser.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax import lax

    from stereovisionarray_tpu.ops.cost_pallas import fused_cost_volume_pallas_wdh
    from stereovisionarray_tpu.ops.sgm_pallas import sgm_extract_fused_wdh

    P1, P2, P2MIN = 8.0 * 4, 96.0 * 4, 24.0 * 4
    EX = dict(subpixel=True, uniqueness=0.95, lr_max_diff=1.5)

    rng = np.random.default_rng(0)
    base = rng.uniform(0.0, 255.0, size=(H, W + 32)).astype(np.float32)
    left = jax.device_put(jnp.asarray(base[..., :W]))
    right = jax.device_put(jnp.asarray(base[..., 32:]))

    def chain(l, rt):
        vol_t = fused_cost_volume_pallas_wdh(
            l, rt, D, census_window=(7, 9), bt_weight=0.25, bt_clip=32.0,
            block_rows=48,
        )
        vol = jnp.transpose(vol_t, (2, 1, 0))
        res = sgm_extract_fused_wdh(
            vol, vol_t, p1=P1, p2=P2, num_paths=8, image=l,
            adaptive_p2=True, p2_min=P2MIN, **EX,
        )
        return res.disparity.sum() + res.cost.sum()

    def laxmap_k(k):
        @jax.jit
        def prog():
            salts = jnp.arange(1, k + 1, dtype=jnp.float32)
            return jnp.sum(lax.map(lambda s: chain(left + s, right), salts))
        return prog

    def vmap_k(k):
        @jax.jit
        def prog():
            salts = jnp.arange(1, k + 1, dtype=jnp.float32)
            ls = left[None] + salts[:, None, None]
            rs = jnp.broadcast_to(right, (k, H, W))
            return jnp.sum(jax.vmap(chain)(ls, rs))
        return prog

    print(f"{'variant':12s} {'ms/frame':>9s}")
    for name, mk in (("laxmap", laxmap_k), ("vmap", vmap_k)):
        try:
            ps, pb = mk(K_SMALL), mk(K_BIG)
            float(ps())
            float(pb())
        except Exception as e:
            print(f"{name:12s} FAILED: {type(e).__name__}: {str(e)[:160]}")
            continue
        t_s, t_b = [], []
        for _ in range(args.repeats):
            t0 = time.perf_counter(); float(ps()); t_s.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); float(pb()); t_b.append(time.perf_counter() - t0)
        ms = (statistics.median(t_b) - statistics.median(t_s)) / (K_BIG - K_SMALL) * 1e3
        print(f"{name:12s} {ms:9.3f}", flush=True)


if __name__ == "__main__":
    main()
