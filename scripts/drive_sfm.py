"""End-to-end drive of array calibration (verify harness): render the rig,
perturb the pose guess by 1 cm, calibrate from images, check ATE."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

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
    rig = reference_rig(rows=3, cols=3, spacing=0.05, origin=(-0.05, -0.05), resolution=res)
    imgs, _ = render_camera_array(rig, res)
    rng = np.random.default_rng(1)

    t_bad = np.asarray(rig.t).copy()
    t_bad[1:] += rng.normal(0, 0.01, t_bad[1:].shape).astype(np.float32)
    init = make_camera_array(rig.fx, rig.fy, rig.cx, rig.cy, np.asarray(rig.R), t_bad)

    cfg = SfMConfig(max_features=512, ba_iterations=30, ba_damping=1e-3)
    out = calibrate_array(jnp.asarray(imgs), init, 4, cfg, rounds=2)

    ate0 = float(absolute_trajectory_error(init.centers, rig.centers, align_scale=True))
    ate1 = float(
        absolute_trajectory_error(out.cameras.centers, rig.centers, align_scale=True)
    )
    baseline = 0.05
    print(
        f"calibration: ATE {ate0 * 1000:.2f}mm -> {ate1 * 1000:.3f}mm "
        f"({ate1 / baseline * 100:.2f}% of baseline), "
        f"{int(out.num_obs)} obs, {int(np.asarray(out.point_valid).sum())} tracks"
    )
    assert ate1 < 0.0015, f"calibration ATE regression: {ate1}"
    assert ate1 < ate0 / 4, "calibration barely improved the init"
    print("SFM DRIVE OK")


if __name__ == "__main__":
    main()
