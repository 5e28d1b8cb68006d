"""A/B device timing: old SGM orchestration vs fused sweep+extract variants.

Variants (540x768x64, int16 costs, adaptive P2, subpixel+uniq+LR — the
bench.py configuration):

  old         hdw builder -> sgm_aggregate_pallas_hdw (2 XLA volume
              transposes + 4-volume add) -> extract_disparity_hdw
  fused_both  hdw builder + roll-free wdh builder (cost built twice,
              ZERO pre-sweep transposes) -> sgm_extract_fused_hdw
  fused_hdw   hdw builder only -> sgm_extract_fused_hdw(vol, None)
              (one hdw->wdh transpose inside)
  fused_wdh   wdh builder only -> one wdh->hdw transpose ->
              sgm_extract_fused_hdw(vol, vol_t)

All variants end at disparity/valid maps; fenced by a scalar fetch.
Slope method (see perf_stages.py): ms/frame = (T(K=16)-T(K=4))/12.

Usage: python scripts/perf_fused_ab.py [--repeats N] [--variant NAME]
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
    parser.add_argument("--repeats", type=int, default=7)
    parser.add_argument("--variant", default=None)
    args = parser.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax import lax

    from stereovisionarray_tpu.ops.cost_pallas import (
        fused_cost_volume_pallas_hdw,
        fused_cost_volume_pallas_wdh,
    )
    from stereovisionarray_tpu.ops.extract_pallas import extract_disparity_hdw
    from stereovisionarray_tpu.ops.sgm_pallas import (
        sgm_aggregate_pallas_hdw,
        sgm_extract_fused_hdw,
    )

    P1, P2, P2MIN = 8.0 * 4, 96.0 * 4, 24.0 * 4  # COST_SCALE = 4
    EX = dict(subpixel=True, uniqueness=0.95, lr_max_diff=1.5)

    rng = np.random.default_rng(0)
    base = rng.uniform(0.0, 255.0, size=(H, W + 32)).astype(np.float32)
    left = jax.device_put(jnp.asarray(base[..., :W]))
    right = jax.device_put(jnp.asarray(base[..., 32:]))

    def build_hdw(l):
        return fused_cost_volume_pallas_hdw(
            l, right, D, census_window=(7, 9), bt_weight=0.25, bt_clip=32.0
        )

    def build_wdh(l):
        return fused_cost_volume_pallas_wdh(
            l, right, D, census_window=(7, 9), bt_weight=0.25, bt_clip=32.0
        )

    def fence(res):
        return res.disparity.sum() + res.cost.sum()

    variants = {}

    def variant(name):
        def deco(f):
            variants[name] = f
            return f
        return deco

    @variant("old")
    def _old(s):
        l = left + s
        vol = build_hdw(l)
        agg = sgm_aggregate_pallas_hdw(
            vol, p1=P1, p2=P2, num_paths=8, image=l, adaptive_p2=True,
            p2_min=P2MIN,
        )
        return fence(extract_disparity_hdw(agg, **EX))

    @variant("fused_both")
    def _both(s):
        l = left + s
        vol = build_hdw(l)
        vol_t = build_wdh(l)
        return fence(sgm_extract_fused_hdw(
            vol, vol_t, p1=P1, p2=P2, num_paths=8, image=l,
            adaptive_p2=True, p2_min=P2MIN, **EX,
        ))

    @variant("fused_hdw")
    def _hdw(s):
        l = left + s
        vol = build_hdw(l)
        return fence(sgm_extract_fused_hdw(
            vol, None, p1=P1, p2=P2, num_paths=8, image=l,
            adaptive_p2=True, p2_min=P2MIN, **EX,
        ))

    @variant("fused_wdh")
    def _wdh(s):
        l = left + s
        vol_t = build_wdh(l)
        vol = jnp.transpose(vol_t, (2, 1, 0))
        return fence(sgm_extract_fused_hdw(
            vol, vol_t, p1=P1, p2=P2, num_paths=8, image=l,
            adaptive_p2=True, p2_min=P2MIN, **EX,
        ))

    @variant("old_wdh")
    def _old_wdh(s):
        # roll-free WDH builder + one transpose to HDW + the unfused
        # aggregate/extract: isolates the builder win from extraction fusion
        l = left + s
        vol_t = build_wdh(l)
        vol = jnp.transpose(vol_t, (2, 1, 0))
        agg = sgm_aggregate_pallas_hdw(
            vol, p1=P1, p2=P2, num_paths=8, image=l, adaptive_p2=True,
            p2_min=P2MIN, vol_t=vol_t,
        )
        return fence(extract_disparity_hdw(agg, **EX))

    @variant("fused_rl")
    def _rl(s):
        # horizontal sweeps LAST: extraction fused into the reverse
        # horizontal sweep (streaming right-WTA, no aggregated volume in
        # HBM, no lane barrels in extraction)
        from stereovisionarray_tpu.ops.sgm_pallas import sgm_extract_fused_wdh

        l = left + s
        vol_t = build_wdh(l)
        vol = jnp.transpose(vol_t, (2, 1, 0))
        return fence(sgm_extract_fused_wdh(
            vol, vol_t, p1=P1, p2=P2, num_paths=8, image=l,
            adaptive_p2=True, p2_min=P2MIN, **EX,
        ))

    @variant("fused_rl_2build")
    def _rl2(s):
        # both volumes from Pallas builders (no XLA transpose at all):
        # isolates hdw-builder-vs-transpose as the HDW-volume producer
        from stereovisionarray_tpu.ops.sgm_pallas import sgm_extract_fused_wdh

        l = left + s
        vol = build_hdw(l)
        vol_t = build_wdh(l)
        return fence(sgm_extract_fused_wdh(
            vol, vol_t, p1=P1, p2=P2, num_paths=8, image=l,
            adaptive_p2=True, p2_min=P2MIN, **EX,
        ))

    @variant("pipeline")
    def _pipe(s):
        # the bench.py call: whatever models/two_view.py wires up
        from stereovisionarray_tpu.config import CostConfig, SGMConfig
        from stereovisionarray_tpu.models.two_view import two_view_disparity

        cc = CostConfig(num_disparities=D, census_window=(7, 9), dtype="int16")
        sc = SGMConfig(p1=8.0, p2=96.0, num_paths=8, adaptive_p2=True)
        out = two_view_disparity(left + s, right, cc, sc)
        return out.disparity.sum() + out.cost.sum()

    @variant("wdh_build_only")
    def _wb(s):
        return build_wdh(left + s).astype(jnp.int32).sum()

    def run_k(f, k):
        @jax.jit
        def prog():
            salts = jnp.arange(1, k + 1, dtype=jnp.float32)
            return jnp.sum(lax.map(f, salts))
        return prog

    selected = (
        {k: variants[k] for k in args.variant.split(",")}
        if args.variant
        else variants
    )
    print(f"{'variant':20s} {'ms/frame':>9s}")
    for name, f in selected.items():
        try:
            ps, pb = run_k(f, K_SMALL), run_k(f, K_BIG)
            float(ps())
            float(pb())
        except Exception as e:  # compile failure — report, keep going
            print(f"{name:20s} FAILED: {type(e).__name__}: {str(e)[:200]}")
            continue
        t_s, t_b = [], []
        for _ in range(args.repeats):
            t0 = time.perf_counter(); float(ps()); t_s.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); float(pb()); t_b.append(time.perf_counter() - t0)
        ms = (statistics.median(t_b) - statistics.median(t_s)) / (K_BIG - K_SMALL) * 1e3
        print(f"{name:20s} {ms:9.3f}")


if __name__ == "__main__":
    main()
