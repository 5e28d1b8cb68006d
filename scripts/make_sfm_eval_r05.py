"""EVAL_SFM_r05 — calibration at REFERENCE SCALE (VERDICT r4 item 7).

The reference rig is 5x5 (``/root/reference/src/CameraStereoVision.cpp:
33-39``); rounds 2-4 validated calibration on a 3x3 @ 180x240 sub-rig.
This calibrates the full 5x5 at 270x360 (the array-pipeline working
resolution) WITH distortion estimation on a lensed render, reporting ATE,
inlier reprojection, track/observation counts, and wall time.

Plus the k2-AMBIGUITY study: r4 recovered k2 = 0.31 vs true 0.03 ("weakly
identifiable" — it trades off against k1 at this FOV). The claim that the
ambiguity is HARMLESS needs an artifact: sweep the true k2 across the
ridge and show pose metrics stay flat even where the recovered (k1, k2)
pair differs from truth.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from stereovisionarray_tpu.config import SfMConfig
from stereovisionarray_tpu.datasets.synthetic import (
    reference_rig, render_camera_array,
)
from stereovisionarray_tpu.evaluation.metrics import absolute_trajectory_error
from stereovisionarray_tpu.geometry.camera import make_camera_array
from stereovisionarray_tpu.geometry.distortion import Distortion, distort_image
from stereovisionarray_tpu.models.calibration import calibrate_array


def perturbed(rig, rms, seed):
    t_bad = np.asarray(rig.t).copy()
    t_bad[1:] += np.random.default_rng(seed).normal(
        0, rms, t_bad[1:].shape).astype(np.float32)
    return make_camera_array(rig.fx, rig.fy, rig.cx, rig.cy,
                             np.asarray(rig.R), t_bad)


def ate_mm(cams, rig):
    return round(float(absolute_trajectory_error(
        cams.centers, rig.centers, align_scale=True)) * 1e3, 3)


def main():
    out_path = os.path.join(os.path.dirname(__file__), "..",
                            "EVAL_SFM_r05.json")
    artifact = {}

    # ---- 5x5 @ 270x360 with a real lens, estimate_distortion on --------
    res = (270, 360)
    rig = reference_rig(rows=5, cols=5, spacing=0.05, resolution=res)
    imgs, _ = render_camera_array(rig, res)
    kt = Distortion(k1=-0.2, k2=0.03)
    dimgs = jnp.stack([
        distort_image(jnp.asarray(imgs[i]), rig[i], kt)[0]
        for i in range(len(rig))
    ])
    init = perturbed(rig, 0.01, 1)
    cfg = SfMConfig(max_features=512, ba_iterations=30, ba_damping=1e-3)
    t0 = time.perf_counter()
    out = calibrate_array(dimgs, init, 12, cfg, rounds=2,
                          estimate_distortion=True)
    wall = time.perf_counter() - t0
    artifact["reference_scale"] = {
        "rig": "5x5 @ 270x360, spacing 0.05 m, 1 cm RMS translation "
               "perturbation, Brown-Conrady k1=-0.2 k2=0.03 lens",
        "ate_mm_initial": ate_mm(init, rig),
        "ate_mm_calibrated": ate_mm(out.cameras, rig),
        "observations": int(out.num_obs),
        "tracks": int(np.asarray(out.point_valid).sum()),
        "inlier_reproj_px": round(float(out.inlier_reproj), 4),
        "outlier_fraction": round(float(out.outlier_fraction), 4),
        "k1": round(float(out.distortion[0]), 4),
        "k2": round(float(out.distortion[1]), 4),
        "wall_s_cpu": round(wall, 1),
    }
    print("reference_scale", json.dumps(artifact["reference_scale"]),
          flush=True)

    # ---- k2-ambiguity ridge --------------------------------------------
    res3 = (180, 240)
    rig3 = reference_rig(rows=3, cols=3, spacing=0.05, origin=(-0.05, -0.05),
                         resolution=res3)
    imgs3, _ = render_camera_array(rig3, res3)
    rows = []
    for k2_true in (0.0, 0.05, 0.15, 0.3):
        kt = Distortion(k1=-0.3, k2=k2_true)
        d3 = jnp.stack([
            distort_image(jnp.asarray(imgs3[i]), rig3[i], kt)[0]
            for i in range(len(rig3))
        ])
        init3 = perturbed(rig3, 0.005, 0)
        aware = calibrate_array(d3, init3, 4, cfg, rounds=2,
                                estimate_distortion=True)
        rows.append({
            "k2_true": k2_true,
            "k1_est": round(float(aware.distortion[0]), 4),
            "k2_est": round(float(aware.distortion[1]), 4),
            "ate_mm": ate_mm(aware.cameras, rig3),
            "inlier_reproj_px": round(float(aware.inlier_reproj), 4),
        })
        print("k2 ridge", rows[-1], flush=True)
    artifact["k2_ambiguity"] = {
        "rig": "3x3 @ 180x240, k1=-0.3, 5 mm RMS perturbation",
        "rows": rows,
        "note": "k2_est wanders along the (k1,k2) trade-off ridge (both "
                "coefficients bend the same observed radii at this FOV); "
                "the claim of record is that POSE metrics stay flat "
                "across the ridge — the ambiguity costs nothing the "
                "calibration consumer can observe",
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact))


if __name__ == "__main__":
    main()
