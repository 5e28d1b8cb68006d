"""Emit EVAL_CONF_r{N}.json — does the PKRN confidence map actually rank
reliability? Standard sparsification analysis (Hu & Mordohai's confidence
benchmark protocol) on the committed Middlebury-format fixture:

  - sort valid pixels by confidence, descending; remove the least-confident
    fraction f and re-measure bad-2.0 on the rest (the sparsification
    curve). A useful measure drives the error DOWN as f grows.
  - the ORACLE curve removes pixels by true |error| instead — the best any
    measure could do. AUSE = area between the two normalized curves
    (0 = oracle-perfect ranking).
  - random-removal baseline (flat curve) for reference.

Usage: python scripts/make_confidence_eval.py [--out EVAL_CONF_r04.json]
Runs on CPU (forced); same pipeline config as make_eval_fixture.py / EVAL_r03.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

SCENE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         "data", "eval_scene")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="EVAL_CONF_r04.json")
    args = ap.parse_args()

    from stereovisionarray_tpu.config import CostConfig, SGMConfig
    from stereovisionarray_tpu.datasets.middlebury import load_middlebury_pair
    from stereovisionarray_tpu.models.two_view import two_view_disparity

    pair = load_middlebury_pair(SCENE_DIR)
    cost_cfg = CostConfig(num_disparities=pair.ndisp, census_window=(7, 9))
    sgm_cfg = SGMConfig(p1=8.0, p2=96.0, num_paths=8, adaptive_p2=True,
                        uniqueness=0.95, lr_max_diff=1.5)
    out = two_view_disparity(
        jnp.asarray(pair.left), jnp.asarray(pair.right), cost_cfg, sgm_cfg
    )
    gt = np.asarray(pair.gt_disparity)
    x = np.arange(pair.left.shape[1])[None, :]
    matchable = np.asarray(pair.valid_gt) & (x >= np.ceil(gt))
    valid = np.asarray(out.valid) & matchable
    err = np.abs(np.asarray(out.disparity) - gt)[valid]
    conf = np.asarray(out.confidence)[valid]
    n = err.size

    def curve(order):
        """bad-2.0 of the kept pixels after removing the first k of
        `order` (worst-ranked first), at removal fractions 0..0.9."""
        e = err[order]
        bad = (e > 2.0).astype(np.float64)
        # suffix means: kept = e[k:]
        suffix = np.concatenate([np.cumsum(bad[::-1])[::-1], [0.0]])
        fracs = np.round(np.arange(0.0, 0.91, 0.1), 2)
        pts = {}
        for f in fracs:
            k = int(f * n)
            pts[f"{f:.1f}"] = round(float(suffix[k] / max(n - k, 1)), 6)
        return pts

    # remove least-confident first -> order ascending by confidence
    sp_conf = curve(np.argsort(conf, kind="stable"))
    # oracle: remove largest-error first -> order descending by error
    sp_oracle = curve(np.argsort(-err, kind="stable"))

    # AUSE over the same removal grid (normalized by the full-density error)
    base = sp_conf["0.0"]
    grid = [f"{f:.1f}" for f in np.round(np.arange(0.0, 0.91, 0.1), 2)]
    ause = float(np.mean([sp_conf[g] - sp_oracle[g] for g in grid]))

    report = {
        "fixture": "data/eval_scene (same as EVAL_r03)",
        "pixels": int(n),
        "bad_2.0_full_density": base,
        "sparsification_bad2": sp_conf,
        "sparsification_oracle_bad2": sp_oracle,
        "ause_bad2": round(ause, 6),
        "mean_conf_good_pixels": round(float(conf[err <= 2.0].mean()), 4),
        "mean_conf_bad_pixels": round(
            float(conf[err > 2.0].mean()) if (err > 2.0).any() else 0.0, 4),
        "note": "sparsification: bad-2.0 of kept pixels after removing the "
                "least-confident fraction (row key). Oracle removes by true "
                "error. AUSE = mean gap over the grid; 0 = perfect ranking.",
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
