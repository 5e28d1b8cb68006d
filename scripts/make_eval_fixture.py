"""Build the committed golden-eval fixture + run the bad-2.0 evaluation.

VERDICT r1 item 5 asks for a REAL Middlebury pair with PFM ground truth.
This sandbox has no network egress (verified: imageio/scipy sample
downloads fail with DNS errors) and ships no image datasets, so the
highest-fidelity captured fixture available is a ray-traced rectified
stereo pair with EXACT analytic ground truth:

  - the analytic ray renderer (datasets/synthetic.py): correct occlusions,
    multi-octave value-noise texture (natural 1/f-ish spectrum), depth-
    dependent shading;
  - a scene with 10 surfaces spanning the disparity budget, slanted-depth
    steps, a sphere (curved disparity), and occlusion bands;
  - written to disk in the REAL Middlebury 2014 on-disk format (im0.png /
    im1.png via the native C++ PNG codec, disp0.pfm, calib.txt) and read
    back through `datasets.middlebury.load_middlebury_pair`, so the entire
    real-data ingest path is exercised byte-for-byte.

Running this script regenerates data/eval_scene/ deterministically and
writes EVAL_r03.json with bad-2.0 / EPE / density (the reference's golden
pattern, /root/reference/src/functions.cpp:323-329,348-354).

Usage: python scripts/make_eval_fixture.py [--platform cpu|tpu]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPO = os.path.normpath(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
SCENE_DIR = os.path.join(REPO, "data", "eval_scene")

H, W = 540, 720
FOCAL_M = 0.05
SENSOR_M = 0.036
BASELINE_M = 0.03
CAM_Z = -0.40
NDISP = 64


def build_fixture():
    from stereovisionarray_tpu.datasets.io import save_png
    from stereovisionarray_tpu.datasets.middlebury import write_pfm
    from stereovisionarray_tpu.datasets.synthetic import (
        SceneSpec,
        render_view,
    )
    from stereovisionarray_tpu.geometry.camera import translation_only_array

    pix = SENSOR_M / W
    fx = FOCAL_M / pix  # 1000 px
    pos = np.array(
        [[0.0, 0.0, CAM_Z], [BASELINE_M, 0.0, CAM_Z]], dtype=np.float32
    )
    cams = translation_only_array(FOCAL_M, pos, pix, resolution=(H, W))

    # Depth budget: disparity = fx * B / depth = 30 / depth px.
    # Scene depths (z - CAM_Z) span [0.50, 0.92] -> disparities 32.6..60.0.
    scene = SceneSpec(
        background_z=0.52,  # depth 0.92, d = 32.6
        patches=(
            (-0.16, -0.065, -0.14, 0.00, 0.32),   # depth 0.72, d 41.7
            (-0.16, -0.08, 0.02, 0.13, 0.22),     # depth 0.62, d 48.4
            (-0.05, 0.05, -0.15, -0.05, 0.27),    # depth 0.67, d 44.8
            (0.00, 0.10, 0.05, 0.14, 0.17),       # depth 0.57, d 52.6
            (0.065, 0.16, -0.12, -0.02, 0.37),    # depth 0.77, d 39.0
            (0.10, 0.17, 0.00, 0.04, 0.12),       # depth 0.52, d 57.7
            (-0.03, 0.035, 0.00, 0.055, 0.42),    # depth 0.82, d 36.6
            (-0.115, -0.04, -0.05, 0.015, 0.10),  # depth 0.50, d 60.0
        ),
        sphere_center=(0.035, -0.055, 0.24),  # front: depth ~0.60, d ~50
        sphere_radius=0.035,
        texture_octaves=6,
        texture_seed=20260817,
    )

    left, depth_l = render_view(cams, 0, (H, W), scene)
    right, _ = render_view(cams, 1, (H, W), scene)
    gt_disp = (fx * BASELINE_M / depth_l).astype(np.float32)

    os.makedirs(SCENE_DIR, exist_ok=True)
    save_png(os.path.join(SCENE_DIR, "im0.png"), left, vmin=0.0, vmax=255.0)
    save_png(os.path.join(SCENE_DIR, "im1.png"), right, vmin=0.0, vmax=255.0)
    write_pfm(os.path.join(SCENE_DIR, "disp0.pfm"), gt_disp)
    with open(os.path.join(SCENE_DIR, "calib.txt"), "w") as f:
        f.write(
            f"cam0=[{fx} 0 {W/2}; 0 {fx} {H/2}; 0 0 1]\n"
            f"cam1=[{fx} 0 {W/2}; 0 {fx} {H/2}; 0 0 1]\n"
            f"doffs=0\nbaseline={BASELINE_M * 1000}\n"
            f"width={W}\nheight={H}\nndisp={NDISP}\n"
        )
    with open(os.path.join(SCENE_DIR, "PROVENANCE.md"), "w") as f:
        f.write(
            "# eval_scene provenance\n\n"
            "Ray-traced rectified stereo pair with exact analytic ground\n"
            "truth, generated deterministically by\n"
            "`scripts/make_eval_fixture.py` (seed 20260817). This stands in\n"
            "for a captured Middlebury pair because the build sandbox has NO\n"
            "network egress (imageio/scipy sample downloads fail with DNS\n"
            "errors) and ships no stereo datasets. The on-disk format is the\n"
            "real Middlebury 2014 layout (im0/im1.png, disp0.pfm, calib.txt)\n"
            "and evaluation consumes it through the real loader\n"
            "(`datasets.middlebury.load_middlebury_pair`).\n"
        )
    return gt_disp


def evaluate():
    import jax

    parser = argparse.ArgumentParser()
    parser.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    args = parser.parse_args()
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    else:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
        )
    import jax.numpy as jnp

    from stereovisionarray_tpu.config import CostConfig, SGMConfig
    from stereovisionarray_tpu.datasets.middlebury import load_middlebury_pair
    from stereovisionarray_tpu.evaluation import bad_pixel_ratio, end_point_error
    from stereovisionarray_tpu.models.two_view import two_view_disparity

    build_fixture()
    pair = load_middlebury_pair(SCENE_DIR)
    assert pair.gt_disparity is not None and pair.ndisp == NDISP

    cost_cfg = CostConfig(num_disparities=pair.ndisp, census_window=(7, 9))
    sgm_cfg = SGMConfig(
        p1=8.0, p2=96.0, num_paths=8, adaptive_p2=True,
        uniqueness=0.95, lr_max_diff=1.5,
    )
    out = two_view_disparity(
        jnp.asarray(pair.left), jnp.asarray(pair.right), cost_cfg, sgm_cfg
    )
    pred = jnp.asarray(out.disparity)
    valid = jnp.asarray(out.valid)
    gt = jnp.asarray(pair.gt_disparity)

    # mask: GT known + geometrically matchable (left border x < d has no
    # counterpart in the right image; the LR check already drops occlusions)
    x = jnp.arange(pair.left.shape[1])[None, :]
    matchable = jnp.asarray(pair.valid_gt) & (x >= jnp.ceil(gt))
    eval_mask = matchable & valid

    report = {
        "fixture": "data/eval_scene (ray-traced, exact GT; NO network in sandbox "
                   "=> no captured Middlebury data available — see PROVENANCE.md)",
        "resolution": [int(pair.left.shape[0]), int(pair.left.shape[1])],
        "ndisp": pair.ndisp,
        "density": float(jnp.mean(valid & matchable) / jnp.mean(matchable)),
        "bad_0.5": float(bad_pixel_ratio(pred, gt, 0.5, mask=eval_mask)),
        "bad_1.0": float(bad_pixel_ratio(pred, gt, 1.0, mask=eval_mask)),
        "bad_2.0": float(bad_pixel_ratio(pred, gt, 2.0, mask=eval_mask)),
        "epe": float(end_point_error(pred, gt, mask=eval_mask)),
        "baseline_bound": "BASELINE.json: bad-2.0 within reference-matching bound",
    }
    with open(os.path.join(REPO, "EVAL_r03.json"), "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(json.dumps(report, sort_keys=True))


if __name__ == "__main__":
    evaluate()
