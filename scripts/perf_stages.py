"""Per-stage device timing of the Pallas two-view pipeline on the TPU.

Method: for each stage f, build a jitted program that runs f K times over
varied inputs (lax.map over salts) and fences with a scalar fetch. Timing
the SAME stage at two different K and taking the slope
``(T(K_big) - T(K_small)) / (K_big - K_small)`` cancels per-dispatch tunnel
overhead (see bench.py). Prints ms per stage invocation.

Usage:  python scripts/perf_stages.py [--stage NAME]
"""

import argparse
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")

H, W, D = 540, 768, 64
K_SMALL, K_BIG = 4, 16
REPEATS = 7


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--stage", default=None, help="only time this stage")
    parser.add_argument("--repeats", type=int, default=REPEATS)
    args = parser.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax import lax

    from stereovisionarray_tpu.config import CostConfig, SGMConfig
    from stereovisionarray_tpu.models.two_view import two_view_disparity
    from stereovisionarray_tpu.ops.cost_pallas import fused_cost_volume_pallas_hdw
    from stereovisionarray_tpu.ops.extract_pallas import extract_disparity_hdw
    from stereovisionarray_tpu.ops.sgm_pallas import (
        _sweep_hdw,
        _sweep_hdw_stacked,
        sgm_aggregate_pallas_hdw,
    )

    cost_cfg = CostConfig(num_disparities=D, census_window=(7, 9), dtype="int16")
    sgm_cfg = SGMConfig(p1=8.0, p2=96.0, num_paths=8, adaptive_p2=True)

    rng = np.random.default_rng(0)
    base = rng.uniform(0.0, 255.0, size=(H, W + 32)).astype(np.float32)
    left = jax.device_put(jnp.asarray(base[..., :W]))
    right = jax.device_put(jnp.asarray(base[..., 32:]))
    vol = jax.device_put(
        jnp.asarray(
            rng.integers(0, 400, size=(H, D, W)).astype(np.int16)
        )
    )
    p2_map = jnp.full((H, W), np.int32(96 * 4)).astype(jnp.int16)
    p2_map_t = jnp.transpose(p2_map)
    agg = (vol.astype(jnp.int32) * 8).astype(jnp.int16)

    stages = {}

    def stage(name):
        def deco(f):
            stages[name] = f
            return f
        return deco

    @stage("cost_build")
    def _cost(s):
        return fused_cost_volume_pallas_hdw(
            left + s, right, D, census_window=(7, 9), bt_weight=0.25, bt_clip=32.0
        ).astype(jnp.int32).sum()

    @stage("cost_census_only")
    def _cost_nobt(s):
        return fused_cost_volume_pallas_hdw(
            left + s, right, D, census_window=(7, 9), bt_weight=0.0, bt_clip=32.0
        ).astype(jnp.int32).sum()

    @stage("cost_small_census")
    def _cost_small(s):
        return fused_cost_volume_pallas_hdw(
            left + s, right, D, census_window=(5, 5), bt_weight=0.25, bt_clip=32.0
        ).astype(jnp.int32).sum()

    @stage("sweep_down_stacked")
    def _down(s):
        v = vol + s.astype(jnp.int16)
        return _sweep_hdw_stacked(v, p2_map, 32, False, False).astype(jnp.int32).sum()

    @stage("sweep_up_stacked")
    def _up(s):
        v = vol + s.astype(jnp.int16)
        return _sweep_hdw_stacked(v, p2_map, 32, True, False).astype(jnp.int32).sum()

    # CAUTION: a bare `.sum()` fence lets XLA DCE the transpose entirely
    # (sum commutes with permutation) — these two stages measured 0.03 /
    # 0.01 ms, i.e. nothing. The iota weighting below blocks the rewrite
    # for transpose_vol; transpose_add_xla remains partially foldable.
    # Prefer the in-pipeline aggregate deltas for transpose costs.
    @stage("transpose_vol")
    def _tr(s):
        v = vol + s.astype(jnp.int16)
        t = jnp.transpose(v, (2, 1, 0)).astype(jnp.int32)
        wgt = jax.lax.broadcasted_iota(jnp.int32, t.shape, 2) % 3
        return (t * wgt).sum()

    @stage("transpose_vol_pallas")
    def _trp(s):
        from stereovisionarray_tpu.ops.sgm_pallas import transpose_hdw

        v = vol + s.astype(jnp.int16)
        return transpose_hdw(v).astype(jnp.int32).sum()

    @stage("transpose_add_xla")
    def _tax(s):
        v = vol + s.astype(jnp.int16)
        ht = jnp.transpose(vol, (2, 1, 0)) + s.astype(jnp.int16)
        return (v + jnp.transpose(ht, (2, 1, 0))).astype(jnp.int32).sum()

    @stage("transpose_add_pallas")
    def _tap(s):
        from stereovisionarray_tpu.ops.sgm_pallas import transpose_add_hdw

        v = vol + s.astype(jnp.int16)
        ht = jnp.transpose(vol, (2, 1, 0)) + s.astype(jnp.int16)
        return transpose_add_hdw(v, ht).astype(jnp.int32).sum()

    @stage("sweep_lr")
    def _lr(s):
        v = jnp.transpose(vol + s.astype(jnp.int16), (2, 1, 0))
        return _sweep_hdw(v, p2_map_t, 32, False, False, False).astype(jnp.int32).sum()

    @stage("sweep_lr_pretransposed")
    def _lrp(s):
        vt = jnp.transpose(vol, (2, 1, 0)) + s.astype(jnp.int16)
        return _sweep_hdw(vt, p2_map_t, 32, False, False, False).astype(jnp.int32).sum()

    @stage("final_add")
    def _add(s):
        a = vol + s.astype(jnp.int16)
        b = vol + (s + 1).astype(jnp.int16)
        ct = jnp.transpose(vol, (2, 1, 0)) + s.astype(jnp.int16)
        return (a + b + jnp.transpose(ct, (2, 1, 0))).astype(jnp.int32).sum()

    @stage("sgm_aggregate_full")
    def _agg(s):
        v = vol + s.astype(jnp.int16)
        return sgm_aggregate_pallas_hdw(v, p1=32, p2=384, num_paths=8).astype(jnp.int32).sum()

    @stage("extract")
    def _ex(s):
        a = agg + s.astype(jnp.int16)
        r = extract_disparity_hdw(a, subpixel=True, uniqueness=0.95, lr_max_diff=1.5)
        return r.disparity.sum()

    @stage("full_pipeline")
    def _full(s):
        out = two_view_disparity(left + s, right, cost_cfg, sgm_cfg)
        return out.disparity.sum()

    @stage("full_pipeline_int8")
    def _full8(s):
        cc8 = CostConfig(num_disparities=D, census_window=(7, 9), dtype="int8")
        out = two_view_disparity(left + s, right, cc8, sgm_cfg)
        return out.disparity.sum()

    def run_k(f, k):
        @jax.jit
        def prog():
            salts = jnp.arange(1, k + 1, dtype=jnp.float32)
            return jnp.sum(lax.map(f, salts))
        return prog

    selected = (
        {k: stages[k] for k in args.stage.split(",")} if args.stage else stages
    )
    print(f"{'stage':26s} {'ms/call':>9s}  (slope K={K_SMALL}->{K_BIG}, median of {args.repeats})")
    for name, f in selected.items():
        ps, pb = run_k(f, K_SMALL), run_k(f, K_BIG)
        float(ps())
        float(pb())  # compile + warm
        t_s, t_b = [], []
        for _ in range(args.repeats):
            t0 = time.perf_counter(); float(ps()); t_s.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); float(pb()); t_b.append(time.perf_counter() - t0)
        ms = (statistics.median(t_b) - statistics.median(t_s)) / (K_BIG - K_SMALL) * 1e3
        print(f"{name:26s} {ms:9.3f}")


if __name__ == "__main__":
    main()
