"""Within-run A/B of the sweep-kernel block-row target on the full fused
two-view program (540x768x64, int16).

``sgm_pallas._block_rows`` picks the largest divisor of the sweep-major
axis <= target; 12 beat 8 in round 2 (540 and 768 both divide by 12).
This probes larger targets (more rows per grid step = fewer carry
round-trips and better DMA amortization, at the cost of VMEM block size).
jax caches are cleared between variants so the monkeypatched target is
actually re-traced.

Usage: python scripts/probe_block_rows.py [--targets 12,16,24,32]
"""

import argparse
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

H, W, D = 540, 768, 64
K_SMALL, K_BIG = 4, 16


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--repeats", type=int, default=9)
    parser.add_argument("--targets", default="12,16,24,32")
    args = parser.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax import lax

    from stereovisionarray_tpu.ops import sgm_pallas
    from stereovisionarray_tpu.ops.cost_pallas import fused_cost_volume_pallas_wdh

    orig = sgm_pallas._block_rows

    P1, P2, P2MIN = 8.0 * 4, 96.0 * 4, 24.0 * 4
    EX = dict(subpixel=True, uniqueness=0.95, lr_max_diff=1.5)

    rng = np.random.default_rng(0)
    base = rng.uniform(0.0, 255.0, size=(H, W + 32)).astype(np.float32)
    left = jax.device_put(jnp.asarray(base[..., :W]))
    right = jax.device_put(jnp.asarray(base[..., 32:]))

    def chain(s):
        l = left + s
        vol_t = fused_cost_volume_pallas_wdh(
            l, right, D, census_window=(7, 9), bt_weight=0.25, bt_clip=32.0,
            block_rows=48,
        )
        vol = jnp.transpose(vol_t, (2, 1, 0))
        res = sgm_pallas.sgm_extract_fused_wdh(
            vol, vol_t, p1=P1, p2=P2, num_paths=8, image=l,
            adaptive_p2=True, p2_min=P2MIN, **EX,
        )
        return res.disparity.sum() + res.cost.sum()

    def run_k(k):
        @jax.jit
        def prog():
            salts = jnp.arange(1, k + 1, dtype=jnp.float32)
            return jnp.sum(lax.map(chain, salts))
        return prog

    print(f"{'target':>7s} {'ms/frame':>9s}")
    for tgt in [int(t) for t in args.targets.split(",")]:
        sgm_pallas._block_rows = functools.partial(orig, target=tgt)
        jax.clear_caches()
        try:
            ps, pb = run_k(K_SMALL), run_k(K_BIG)
            float(ps())
            float(pb())
        except Exception as e:
            print(f"{tgt:>7d} FAILED: {type(e).__name__}: {str(e)[:160]}")
            continue
        t_s, t_b = [], []
        for _ in range(args.repeats):
            t0 = time.perf_counter(); float(ps()); t_s.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); float(pb()); t_b.append(time.perf_counter() - t0)
        ms = (statistics.median(t_b) - statistics.median(t_s)) / (K_BIG - K_SMALL) * 1e3
        print(f"{tgt:>7d} {ms:9.3f}", flush=True)
    sgm_pallas._block_rows = orig


if __name__ == "__main__":
    main()
