"""Config-4 evaluation artifact: array self-calibration recovery (feature
detect+match -> triangulate -> Schur-complement BA -> pose refinement),
the reference's calibration capability generalized (the reference hard-codes
the rig from measurements; we RECOVER it from images).

Renders the 3x3 reference rig, perturbs the translation guess by 1 cm RMS,
calibrates from images alone, and records absolute trajectory error before
and after — the BASELINE.json ATE metric. Writes EVAL_SFM_r02.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from stereovisionarray_tpu.config import SfMConfig  # noqa: E402
from stereovisionarray_tpu.datasets.synthetic import (  # noqa: E402
    reference_rig,
    render_camera_array,
)
from stereovisionarray_tpu.evaluation.metrics import (  # noqa: E402
    absolute_trajectory_error,
)
from stereovisionarray_tpu.geometry.camera import make_camera_array  # noqa: E402
from stereovisionarray_tpu.models.calibration import calibrate_array  # noqa: E402


def main():
    res = (180, 240)
    rig = reference_rig(
        rows=3, cols=3, spacing=0.05, origin=(-0.05, -0.05), resolution=res
    )
    imgs, _ = render_camera_array(rig, res)
    rng = np.random.default_rng(1)

    t_bad = np.asarray(rig.t).copy()
    t_bad[1:] += rng.normal(0, 0.01, t_bad[1:].shape).astype(np.float32)
    init = make_camera_array(
        rig.fx, rig.fy, rig.cx, rig.cy, np.asarray(rig.R), t_bad
    )

    cfg = SfMConfig(max_features=512, ba_iterations=30, ba_damping=1e-3)
    out = calibrate_array(jnp.asarray(imgs), init, 4, cfg, rounds=2)

    # distortion study (r4): strong barrel lens, blind vs aware
    from stereovisionarray_tpu.geometry.distortion import (
        Distortion,
        distort_image,
    )

    kt = Distortion(k1=-0.4, k2=0.03)
    dimgs = jnp.stack([
        distort_image(jnp.asarray(imgs[i]), rig[i], kt)[0]
        for i in range(len(rig))
    ])
    t_bad5 = np.asarray(rig.t).copy()
    t_bad5[1:] += np.random.default_rng(0).normal(
        0, 0.005, t_bad5[1:].shape).astype(np.float32)
    init5 = make_camera_array(
        rig.fx, rig.fy, rig.cx, rig.cy, np.asarray(rig.R), t_bad5
    )
    blind = calibrate_array(dimgs, init5, 4, cfg, rounds=2)
    aware = calibrate_array(dimgs, init5, 4, cfg, rounds=2,
                            estimate_distortion=True)
    ate_fn = lambda c: float(absolute_trajectory_error(
        c.centers, rig.centers, align_scale=True))

    ate0 = float(
        absolute_trajectory_error(init.centers, rig.centers, align_scale=True)
    )
    ate1 = float(
        absolute_trajectory_error(
            out.cameras.centers, rig.centers, align_scale=True
        )
    )
    baseline = 0.05
    artifact = {
        "pipeline": "calibrate_array (features -> match -> triangulate -> "
                    "Schur BA -> pose refine)",
        "rig": "3x3 @ 180x240, spacing 0.05 m, 1 cm RMS translation "
               "perturbation",
        "fixture": "ray-traced synthetic rig, exact GT poses "
                   "(datasets.render_camera_array)",
        "ate_mm_initial": round(ate0 * 1e3, 3),
        "ate_mm_calibrated": round(ate1 * 1e3, 3),
        "ate_pct_of_baseline": round(100.0 * ate1 / baseline, 2),
        "observations": int(out.num_obs),
        "tracks": int(np.asarray(out.point_valid).sum()),
        "mean_reproj_px": round(float(out.mean_reproj), 4),
        "inlier_reproj_px": round(float(out.inlier_reproj), 4),
        "inlier_threshold_px": float(out.inlier_threshold_px),
        "outlier_fraction": round(float(out.outlier_fraction), 4),
        "note": "mean_reproj_px averages over ALL match-time-valid "
                "observations including the gross mismatches the tukey BA "
                "zero-weights; inlier_reproj_px (err <= 3x kernel scale, "
                "after the between-rounds re-triangulate+reject) is the "
                "calibration quality of record (VERDICT r2 item 5)",
        "distortion_study": {
            "lens": "Brown-Conrady k1=-0.4 k2=0.03 (strong barrel), "
                    "5 mm RMS translation perturbation",
            "blind": {
                "ate_mm": round(ate_fn(blind.cameras) * 1e3, 3),
                "inlier_reproj_px": round(float(blind.inlier_reproj), 4),
            },
            "estimate_distortion": {
                "ate_mm": round(ate_fn(aware.cameras) * 1e3, 3),
                "inlier_reproj_px": round(float(aware.inlier_reproj), 4),
                "k1": round(float(aware.distortion[0]), 4),
                "k2": round(float(aware.distortion[1]), 4),
            },
            "note": "vertical-parallax closed-form (k1,k2) solved before "
                    "BA (models/calibration.py); at moderate distortion "
                    "(k1=-0.15) blind calibration is already unhurt — free "
                    "structure absorbs the lens on narrow baselines (see "
                    "CLAUDE.md round-4 notes); k2 weakly identifiable at "
                    "this FOV, profile sub-pixel over observed radii",
        },
    }
    with open(os.path.join(os.path.dirname(__file__), "..",
                           "EVAL_SFM_r04.json"), "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact))


if __name__ == "__main__":
    main()
