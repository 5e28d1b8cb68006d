"""Emit EVAL_ROBUST_r{N}.json — accuracy under realistic capture
perturbations (VERDICT r2 item 6 / "what's missing" #2).

Every committed eval so far ran on clean, noise-free fixtures ray-traced by
the repo's own renderer; the reference operates on real photographs
(``/root/reference/src/CameraStereoVision.cpp:14-19`` captured Renders2/,
``/root/reference/src/dlibFaceSelect.cpp:13-17`` real Images/). This sweep
measures the dimension census-vs-SAD choices actually live on: per-view
exposure differences (gain/bias), sensor noise (Gaussian read + shot), and
slight defocus, at severity levels 0 (clean) .. 3.

Per level it records:
  - two-view bad-2.0 / density on the committed Middlebury-format fixture
    (data/eval_scene, the EVAL_r02 protocol);
  - 5x5 array-pipeline median relative depth error (EVAL_ARRAY protocol);
  - face-detection rate + mean score over 12 rendered head scenes
    (frontal, varied position/width/background polarity).

Severity model (all rngs seeded; applied independently per view):
  gain  ~ N(1, 0.03 L)         per-view exposure mismatch
  bias  ~ N(0, 4 L)            per-view black-level offset (intensity units)
  read  ~ N(0, 2 L)            per-pixel Gaussian noise
  shot  ~ N(0, 1) * 0.25 L sqrt(I)   signal-dependent noise
  blur  sigma = 0.4 L px       defocus (separable Gaussian), per-view
                               jittered +-20%

Usage: python scripts/make_robust_eval.py [--out EVAL_ROBUST_r03.json]
Runs on CPU (forced); accuracy is backend-independent.
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

LEVELS = (0, 1, 2, 3)


def _gauss_blur(img: np.ndarray, sigma: float) -> np.ndarray:
    """Separable Gaussian blur, reflect-padded (numpy only)."""
    if sigma <= 1e-6:
        return img
    r = max(1, int(3.0 * sigma + 0.5))
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k /= k.sum()

    def along(a, axis):
        ap = np.take(a, np.clip(np.arange(-r, a.shape[axis] + r), 0,
                                a.shape[axis] - 1), axis=axis)
        return np.apply_along_axis(
            lambda v: np.convolve(v, k, mode="valid"), axis, ap
        )

    return along(along(img.astype(np.float64), 0), 1).astype(np.float32)


def perturb_views(views: np.ndarray, level: int, rng: np.random.Generator
                  ) -> np.ndarray:
    """views: (N, H, W) float [0, 255]. Independent per-view perturbation."""
    if level == 0:
        return views.astype(np.float32)
    L = float(level)
    out = []
    for v in views:
        g = rng.normal(1.0, 0.03 * L)
        b = rng.normal(0.0, 4.0 * L)
        img = v.astype(np.float64) * g + b
        sigma_blur = max(0.0, 0.4 * L * rng.uniform(0.8, 1.2))
        img = _gauss_blur(np.asarray(img, np.float32), sigma_blur)
        img = img + rng.normal(0.0, 2.0 * L, img.shape)
        img = img + rng.standard_normal(img.shape) * (
            0.25 * L * np.sqrt(np.maximum(img, 0.0))
        )
        out.append(np.clip(img, 0.0, 255.0))
    return np.asarray(out, np.float32)


def two_view_metrics(level: int, rng, cost_overrides=None,
                     sgm_overrides=None) -> dict:
    from stereovisionarray_tpu.config import CostConfig, SGMConfig
    from stereovisionarray_tpu.datasets.middlebury import load_middlebury_pair
    from stereovisionarray_tpu.evaluation import bad_pixel_ratio
    from stereovisionarray_tpu.models.two_view import two_view_disparity

    pair = load_middlebury_pair(os.path.join(REPO, "data", "eval_scene"))
    views = perturb_views(
        np.stack([np.asarray(pair.left), np.asarray(pair.right)]), level, rng
    )
    ckw = dict(num_disparities=pair.ndisp, census_window=(7, 9))
    if cost_overrides:
        ckw.update(cost_overrides)
    cost_cfg = CostConfig(**ckw)
    skw = dict(p1=8.0, p2=96.0, num_paths=8, adaptive_p2=True,
               uniqueness=0.95, lr_max_diff=1.5)
    if sgm_overrides:
        skw.update(sgm_overrides)
    sgm_cfg = SGMConfig(**skw)
    out = two_view_disparity(jnp.asarray(views[0]), jnp.asarray(views[1]),
                             cost_cfg, sgm_cfg)
    gt = jnp.asarray(pair.gt_disparity)
    x = jnp.arange(views.shape[2])[None, :]
    matchable = jnp.asarray(pair.valid_gt) & (x >= jnp.ceil(gt))
    eval_mask = matchable & jnp.asarray(out.valid)
    return {
        "bad_2.0": round(float(bad_pixel_ratio(
            jnp.asarray(out.disparity), gt, 2.0, mask=eval_mask)), 5),
        "density": round(float(jnp.mean(out.valid & matchable)
                               / jnp.mean(matchable)), 4),
    }


def array_metrics(level: int, rng, cascade: bool = False) -> dict:
    from stereovisionarray_tpu.config import EngineConfig
    from stereovisionarray_tpu.datasets import (
        SceneSpec, reference_rig, render_camera_array,
    )
    from stereovisionarray_tpu.models import array_depth_pipeline

    rows = cols = 5
    res = (135, 180)
    cams = reference_rig(rows=rows, cols=cols, spacing=0.05, resolution=res)
    images, depths = render_camera_array(cams, res, SceneSpec())
    images = perturb_views(np.asarray(images), level, rng)
    ref_index = (rows // 2) * cols + cols // 2
    cfg = EngineConfig().override(**{
        "camera.rows": rows, "camera.cols": cols,
        "plane_sweep.num_planes": 96, "plane_sweep.topology": "CROSS",
        "plane_sweep.cascade": cascade,
        "refine.radius": 3, "refine.window": 11,
    })
    out = array_depth_pipeline(jnp.asarray(images), cams, cfg,
                               ref_index=ref_index)
    gt = depths[ref_index]
    valid = np.asarray(out.valid)
    inner = np.zeros_like(valid)
    inner[8:-8, 8:-8] = True
    sel = valid & inner
    rerr = np.abs((np.abs(np.asarray(out.refined_depth)) - gt)[sel] / gt[sel])
    return {
        "median_rel_depth_err_refined": round(float(np.median(rerr)), 5),
        "density": round(float(sel.sum() / inner.sum()), 4),
    }


def face_metrics(level: int, rng) -> dict:
    from stereovisionarray_tpu.roi.face import detect_face

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_roi import _render_head  # the shared procedural head scene

    found, scores = [], []
    cases = [
        dict(cu=130.0, cv=80.0, fw=60.0, bright_bg=True),
        dict(cu=90.0, cv=100.0, fw=80.0, bright_bg=True),
        dict(cu=150.0, cv=90.0, fw=48.0, bright_bg=False),
        dict(cu=110.0, cv=70.0, fw=70.0, bright_bg=False),
    ]
    for case in cases:
        for seed in range(3):
            r2 = np.random.default_rng(1000 * level + seed)
            img, _ = _render_head(rng=r2, **case)
            img = perturb_views(img[None], level, rng)[0]
            det = detect_face(jnp.asarray(img))
            found.append(bool(det.found))
            scores.append(float(det.score))
    return {
        "detection_rate": round(float(np.mean(found)), 4),
        "mean_score": round(float(np.mean(scores)), 4),
        "cases": len(found),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="EVAL_ROBUST_r03.json")
    args = ap.parse_args()

    levels = {}
    for L in LEVELS:
        entry = {
            "two_view": two_view_metrics(L, np.random.default_rng(100 + L)),
            # recovery variant: a wider census window averages the ordering
            # evidence over more pixels, trading clean-data sharpness for
            # noise robustness (measured sweep: (11,13) cuts level-3
            # bad-2.0 from 0.63 to 0.44 and level-2 from 0.237 to 0.205;
            # raising bt_weight HURTS — BT compares raw intensities, which
            # per-view gain/bias corrupts but census ordering ignores)
            "two_view_census_11x13": two_view_metrics(
                L, np.random.default_rng(100 + L),
                cost_overrides={"census_window": (11, 13)},
            ),
            # the full recovery: config.noise_robust_preset() (wide census
            # + doubled P1/P2 + relaxed uniqueness/LR) - severity-3 bad-2.0
            # 0.63 -> 0.29 at 2x the density, clean cost 0.73% -> 1.2%
            "two_view_noise_preset": two_view_metrics(
                L, np.random.default_rng(100 + L),
                cost_overrides={"census_window": (11, 13)},
                sgm_overrides={"p1": 16.0, "p2": 288.0, "p2_min": 72.0,
                               "uniqueness": 0.97, "lr_max_diff": 2.5},
            ),
            "array": array_metrics(L, np.random.default_rng(200 + L)),
            # does noise break the cascade's coarse band placement? Same
            # perturbed views, plane_sweep.cascade=true production defaults
            "array_cascade": array_metrics(
                L, np.random.default_rng(200 + L), cascade=True
            ),
            "face": face_metrics(L, np.random.default_rng(300 + L)),
        }
        levels[f"level_{L}"] = entry
        print(json.dumps({f"level_{L}": entry}), flush=True)

    payload = {
        "protocol": {
            "severity_model": "per-view gain N(1,0.03L) + bias N(0,4L); "
                              "Gaussian read noise sigma=2L; shot noise "
                              "0.25L*sqrt(I); defocus blur sigma=0.4L px "
                              "(+-20% per view); L = level",
            "two_view": "data/eval_scene, EVAL_r02 protocol (bad-2.0 on "
                        "GT-known matchable pixels)",
            "array": "5x5 CROSS 135x180x96 (EVAL_ARRAY protocol, refined)",
            "face": "12 rendered head scenes (4 geometries x 3 seeds, both "
                    "background polarities), roi.face.detect_face",
        },
        "levels": levels,
    }
    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({"written": args.out}))


if __name__ == "__main__":
    main()
