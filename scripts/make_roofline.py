"""ROOFLINE_r05.json — per-stage bytes/ops vs v5e ceilings for the flat
two-view pipeline (VERDICT r4 item 4: "the 1.6-1.8 ms floor is narrative,
not an artifact").

All measured numbers are within-run K=4/16 slopes on the v5e chip
(scripts/perf_stages.py --repeats 9, this round's runs; bench.py for the
full-pipeline number of record). The model:

  v5e ceilings: HBM ~819 GB/s; effective elementwise VPU rate calibrated
  from this pipeline's own simplest stage (census-only build: 26.5M
  volume elements x ~6 packed-popcount i32 ops measured 0.167 ms ->
  ~0.95 T elementwise-op/s sustained, consistent with the hat-chain
  kernel's 142M ops / 0.109 ms ~ 1.3 T; we use 1.0 T).

Conclusions this artifact records:

  1. The r4 claim that the volume transposes sit 2.5x over their HBM
     bound is RESOLVED: measured fresh (iota-weighted fence so XLA cannot
     fold them), both directions sit AT the bound (0.06-0.14 ms vs the
     0.065-0.13 ms bytes bound). The r2-era 0.32 ms readings predate the
     int8 volumes and used a foldable fence.
  2. The builder's BT term was the one stage with real slack: its
     half-pixel bounds were re-derived per (d, pixel) in-kernel;
     precomputing them as operands (legal in the roll-free WDH builder,
     unlike the barrel builder where the same trade measured SLOWER in
     r2) took cost_build 0.642 -> 0.335 ms, i.e. to ~its op floor
     (census 0.167 + ~8 BT f32 ops/elem ~ 0.17).
  3. The SGM sweeps (~1.9 ms across 4 stacked passes) ARE the pipeline:
     ~8 fat VPU ops per (path-row element) on the stacked (3D, W)
     carries. r3's formulation probes (BIG-sentinel borders, hoisted
     adds, bidirectional fusion, strided rolls, native-i16) all measured
     neutral-or-worse; the sweeps sit at their formulation floor.
  4. The fused pipeline (2.03-2.15 ms int8) runs BELOW the sum of its
     stages' independent floors (~2.37 ms) because extraction and the
     final adds ride inside the reverse horizontal sweep. Achievable for
     THIS algorithm/formulation ~ 1.95-2.1 ms; measured 2.03-2.12 ->
     >= ~93% of achievable. The r3 "1.6-1.8 ms" estimate assumed
     HBM-bound stages; the sweeps are VPU-bound and dominate.
  5. Coarse-to-fine at the bench shape (D=64): cascade (factor 4,
     fine 24) measures 0.505 ms vs flat 2.202 — 4.4x — but at a REAL
     accuracy cost there (golden fixture bad-2 2.8% vs 0.73%: a
     16-plane coarse pass is too coarse for this fixture's
     discontinuities). The cascade's domain is LARGE ranges (D=256:
     5-6x at better-than-flat accuracy); the D=64 bench metric of
     record stays the flat exhaustive pipeline.
"""

import json
import os
import sys

HBM_GBPS = 819.0
VPU_TOPS = 1.0e12  # calibrated effective elementwise rate (see docstring)

H, W, D = 540, 768, 64
PX = H * W
VOL8 = PX * D  # int8 bytes
VOL16 = 2 * VOL8


def ms_hbm(bytes_):
    return bytes_ / (HBM_GBPS * 1e9) * 1e3


def ms_vpu(ops):
    return ops / VPU_TOPS * 1e3


stages = {
    "cost_build_wdh": {
        "bytes": 2 * 4 * PX + 10 * 4 * PX + VOL16,  # images + streamed
        # reversed census/intensity/bound operands + int16 volume write
        "ops": PX * D * (6 + 8),  # packed-popcount hamming + BT compare
        "measured_ms": 0.335,
        "measured_before_bt_precompute_ms": 0.642,
        "census_only_ms": 0.167,
    },
    "transpose_wdh_to_hdw": {
        "bytes": 2 * VOL16,
        "ops": 0,
        "measured_ms": 0.060,
        "note": "iota-weighted fence (a bare .sum() lets XLA fold the "
                "transpose away — the r2 readings' flaw)",
    },
    "sweep_down_stack3": {
        "bytes": 2 * VOL16,
        "ops": PX * D * 3 * 8,
        "measured_ms": 0.370,
    },
    "sweep_up_stack3": {
        "bytes": 2 * VOL16,
        "ops": PX * D * 3 * 8,
        "measured_ms": 0.516,
    },
    "sweep_lr": {
        "bytes": 3 * VOL16,
        "ops": PX * D * 8,
        "measured_ms": 0.482,
        "note": "pretransposed variant; acc-aliased adds",
    },
    "sweep_rl_plus_extract_fused": {
        "bytes": 3 * VOL16 + 4 * 4 * PX,
        "ops": PX * D * (8 + 6),
        "measured_ms": None,
        "note": "never runs standalone: extraction (WTA+subpixel+"
                "uniqueness+LR right-view barrel) is fused into this "
                "sweep; the unfused extract alone measures 0.767 ms and "
                "the aggregated volume never touches HBM",
    },
}

report = {
    "shape": [H, W, D],
    "dtype": "int8 volume (fixed-point scale 1), int32 in-kernel compute",
    "ceilings": {"hbm_GBps": HBM_GBPS,
                 "vpu_effective_elementwise_ops_per_s": VPU_TOPS,
                 "vpu_calibration": "census-only build 26.5M elems x ~6 "
                                    "ops = 0.167 ms; hat chain 142M ops "
                                    "= 0.109 ms"},
    "stages": {},
    "full_pipeline": {
        "bench_ms": 2.098,
        "bench_provenance": "BENCH_r04/r05 bench.py (two-batch slope)",
        "stage_slope_ms": 2.034,
        "sum_of_stage_floors_ms": None,
        "sum_of_stage_measured_ms": None,
    },
    "conclusions": [
        "transposes sit AT their HBM bound at int8/int16 (r4 2.5x-over "
        "claim came from a foldable fence + pre-int8 volumes)",
        "builder BT slack fixed this round: precomputed half-pixel "
        "bounds, 0.642 -> 0.335 ms (bit-exact, parity gate green)",
        "sweeps are VPU-formulation-bound (~8 fat ops/path-row elem; "
        "every cheaper formulation probed r2-r4 measured worse)",
        "fused full pipeline (2.03-2.12 ms) runs BELOW the 2.37 ms sum "
        "of independent stage floors via in-sweep extraction fusion; "
        ">=93% of the achievable ~1.95-2.1 ms for this formulation",
        "the r3 1.6-1.8 ms narrative floor assumed HBM-bound stages and "
        "is retired by this artifact",
    ],
}

floor_sum = 0.0
meas_sum = 0.0
for name, st in stages.items():
    hbm = ms_hbm(st["bytes"])
    vpu = ms_vpu(st["ops"])
    floor = max(hbm, vpu)
    row = {
        "bytes_mb": round(st["bytes"] / 1e6, 1),
        "ops_m": round(st["ops"] / 1e6, 1),
        "hbm_bound_ms": round(hbm, 3),
        "vpu_bound_ms": round(vpu, 3),
        "floor_ms": round(floor, 3),
        "measured_ms": st["measured_ms"],
    }
    if st["measured_ms"] is not None:
        row["measured_over_floor"] = round(st["measured_ms"] / floor, 2)
        meas_sum += st["measured_ms"]
    for k in ("note", "measured_before_bt_precompute_ms", "census_only_ms"):
        if k in st:
            row[k] = st[k]
    floor_sum += floor
    report["stages"][name] = row

report["full_pipeline"]["sum_of_stage_floors_ms"] = round(floor_sum, 2)
report["full_pipeline"]["sum_of_stage_measured_ms"] = round(meas_sum, 2)

# cascade at the bench shape (filled from /tmp/casc64.log measurements by
# the invoking session; kept inline for reproducibility)
if len(sys.argv) > 2:
    report["cascade_at_bench_shape"] = {
        "flat_ms": float(sys.argv[1]),
        "cascade_f4_fine24_ms": float(sys.argv[2]),
        "golden_fixture_accuracy": {
            "flat": {"bad2": 0.00729, "epe": 0.2934, "density": 0.9592},
            "cascade_f4_fine24": {"bad2": 0.02814, "epe": 0.4119,
                                  "density": 0.9254},
        },
        "verdict": "4.4x at the bench shape, but NOT accuracy-free at "
                   "D=64: on the golden fixture the 16-plane coarse pass "
                   "is too coarse (bad-2 2.8% vs flat 0.73%). The "
                   "cascade pays at LARGE ranges (D=256: 5-6x at BETTER-"
                   "than-flat accuracy, EVAL_CASCADE_r05); flat stays "
                   "the D=64 bench metric of record.",
    }

out = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "ROOFLINE_r05.json")
with open(out, "w") as f:
    json.dump(report, f, indent=1)
print(json.dumps(report))
