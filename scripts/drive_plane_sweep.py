"""End-to-end drive of the N-view plane-sweep pipeline on CPU (verify
harness). Renders the reference 5x5 rig analytically (exact GT), fuses depth
for the center view, and checks accuracy + robustness cases."""

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

from stereovisionarray_tpu.config import PlaneSweepConfig, SGMConfig  # noqa: E402
from stereovisionarray_tpu.datasets.synthetic import (  # noqa: E402
    reference_rig,
    render_camera_array,
)
from stereovisionarray_tpu.models.plane_sweep import plane_sweep_depth  # noqa: E402


def main():
    res = (128, 160)
    rig = reference_rig(rows=5, cols=5, resolution=res)
    imgs, deps = render_camera_array(rig, res)
    ref_i = 12  # center of the 5x5 grid (reference convention)
    gt = deps[ref_i]

    cfg = PlaneSweepConfig(
        num_planes=64, z_near=0.8, z_far=1.05, cost="census", patch=7,
        fusion="topk_mean", topk=6,
    )
    sgm = SGMConfig(p1=1.0, p2=8.0, adaptive_p2=True, p2_min=2.0, lr_max_diff=0.0)
    src = tuple(i for i in range(25) if i != ref_i)

    out = plane_sweep_depth(jnp.asarray(imgs), rig, ref_i, src, cfg, sgm)
    d, v = np.asarray(out.depth), np.asarray(out.valid)
    inner = np.zeros_like(v)
    inner[10:-10, 10:-10] = True
    sel = v & inner
    rel = np.abs(d[sel] - gt[sel]) / gt[sel]
    print(
        f"5x5 plane sweep: mean rel depth err={rel.mean():.4f} "
        f"bad2%={(rel > 0.02).mean():.4f} valid={sel.sum() / inner.sum():.3f}"
    )
    assert rel.mean() < 0.01, "depth accuracy regression"
    assert (rel > 0.02).mean() < 0.05, "bad-pixel regression"

    # fewer views (CROSS topology: 4 neighbours) must still work
    out4 = plane_sweep_depth(jnp.asarray(imgs), rig, ref_i, (7, 11, 13, 17), cfg, sgm)
    d4, v4 = np.asarray(out4.depth), np.asarray(out4.valid)
    sel4 = v4 & inner
    rel4 = np.abs(d4[sel4] - gt[sel4]) / gt[sel4]
    print(f"CROSS 4-view: mean rel err={rel4.mean():.4f}")
    assert np.isfinite(d4).all() and rel4.mean() < 0.02

    # degenerate: constant images must not NaN
    const = jnp.ones_like(jnp.asarray(imgs)) * 128.0
    outc = plane_sweep_depth(const, rig, ref_i, src, cfg, sgm)
    assert np.isfinite(np.asarray(outc.depth)).all(), "NaN on constant input"
    print("degenerate constant input: finite")
    print("PLANE SWEEP DRIVE OK")


if __name__ == "__main__":
    main()
