"""EVAL_SCENES_r05 — scene-diversity accuracy suite (VERDICT r4 item 5).

Every prior eval ran one scene family (fronto-parallel patches + sphere).
This adds the three classes the reference's real-photo regime contains
that that family doesn't (``/root/reference/src/CameraStereoVision.cpp:
14-19``, within the no-network sandbox):

  textureless — a contrast-free wall region (matching is under-determined;
      the uniqueness/support gates must reject rather than invent);
  slanted     — strongly slanted planes (fronto-parallel plane-sweep bias;
      measures whether multiview_refine recovers it);
  thin        — thin raised bars over a far background (heavy occlusion,
      foreground fattening).

Per scene: full 5x5 array pipeline (sweep + SGM + refine) bad-2%/median
rel err, with the refine stage separated (raw sweep vs refined) so the
slant-bias recovery is visible. Runs on CPU (accuracy is
backend-independent).

Finding of record (refine-parameter sweep, r5): multiview_refine cannot
recover the slant-zone bias — its warped-window comparison is itself
fronto-parallel; the default (w11, r3) is already the best setting and
smaller windows / more iterations all make the slant zones WORSE
(0.173 -> 0.23-0.32). Recorded in EVAL_SCENES_r05.json.
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

ROWS = COLS = 5
RES = (135, 180)
PLANES = 96


def scenes():
    from stereovisionarray_tpu.datasets import SceneSpec

    base = dict(background_z=0.30, sphere_radius=0.0, patches=())
    yield "baseline", SceneSpec(
        background_z=0.30,
        patches=((-0.06, 0.02, -0.05, 0.04, 0.10),
                 (0.03, 0.09, -0.02, 0.06, 0.16)),
        sphere_center=(0.0, 0.0, 0.18), sphere_radius=0.045,
    )
    yield "textureless", SceneSpec(
        **base,
        sphere_center=(0.0, 0.0, 0.18),
        textureless=((-0.02, 0.07, -0.06, 0.05, 0.02),),
    )
    yield "slanted", SceneSpec(
        **base,
        sphere_center=(0.0, 0.0, 0.18),
        # two strong slants: depth varies ~2x across each patch
        slants=(
            (-0.09, 0.00, -0.07, 0.07, 0.08, 1.2, 0.0),
            (0.01, 0.10, -0.07, 0.07, 0.20, 0.0, 1.0),
        ),
    )
    yield "thin", SceneSpec(
        background_z=0.30,
        sphere_radius=0.0,
        sphere_center=(0.0, 0.0, 0.18),
        # comb of 4 thin near bars (~4-6 px wide at this resolution)
        patches=tuple(
            (x, x + 0.006, -0.08, 0.08, 0.06) for x in
            (-0.06, -0.02, 0.02, 0.06)
        ),
    )


def run_scene(name, scene):
    from stereovisionarray_tpu.config import EngineConfig
    from stereovisionarray_tpu.datasets import (
        reference_rig, render_camera_array,
    )
    from stereovisionarray_tpu.models import array_depth_pipeline

    cams = reference_rig(rows=ROWS, cols=COLS, spacing=0.05, resolution=RES)
    images, depths = render_camera_array(cams, RES, scene)
    ref_index = (ROWS // 2) * COLS + COLS // 2
    cfg = EngineConfig().override(**{
        "camera.rows": ROWS, "camera.cols": COLS,
        "plane_sweep.num_planes": PLANES, "plane_sweep.topology": "CROSS",
        "refine.radius": 3, "refine.window": 11,
    })
    out = array_depth_pipeline(jnp.asarray(images), cams, cfg,
                               ref_index=ref_index)
    gt = depths[ref_index]
    inner = np.zeros(RES, bool)
    inner[8:-8, 8:-8] = True

    def score(depth, valid):
        sel = np.asarray(valid) & inner
        d = np.abs(np.asarray(depth))
        rel = np.abs(d[sel] - gt[sel]) / gt[sel]
        return {
            "median_rel": round(float(np.median(rel)), 5),
            "bad2pct": round(float((rel > 0.02).mean()), 5),
            "density": round(float(sel.sum() / inner.sum()), 4),
        }

    row = {
        "sweep": score(out.depth, out.valid),
        "refined": score(out.refined_depth, out.valid),
    }
    # region-restricted scores where the fixture has a specific zone
    if name == "slanted":
        # slant zones: depth deviates from background and local gradient
        zone = (np.abs(np.gradient(gt, axis=1)) +
                np.abs(np.gradient(gt, axis=0))) > 5e-3
        zone &= inner
        if zone.sum() > 100:
            for k, dmap in (("sweep_slant", out.depth),
                            ("refined_slant", out.refined_depth)):
                sel = np.asarray(out.valid) & zone
                d = np.abs(np.asarray(dmap))
                rel = np.abs(d[sel] - gt[sel]) / gt[sel]
                row[k] = {
                    "median_rel": round(float(np.median(rel)), 5),
                    "bad2pct": round(float((rel > 0.02).mean()), 5),
                    "density": round(float(sel.sum() / zone.sum()), 4),
                }
    if name == "textureless":
        # flat-wall zone: GT == background and the rendered texture is flat
        zone = inner & (np.abs(gt - gt.max()) < 1e-3)
        img_ref = images[(ROWS // 2) * COLS + COLS // 2]
        lowvar = np.abs(img_ref - 128.0) < 8.0
        zone &= lowvar
        sel = np.asarray(out.valid) & zone
        if zone.sum() > 50:
            d = np.abs(np.asarray(out.refined_depth))
            rel = np.abs(d[sel] - gt[sel]) / gt[sel] if sel.sum() else np.array([0.0])
            row["wall"] = {
                "zone_px": int(zone.sum()),
                "claimed_density": round(float(sel.sum() / zone.sum()), 4),
                "bad2pct_of_claimed": round(float((rel > 0.02).mean()), 5)
                if sel.sum() else None,
            }
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="EVAL_SCENES_r05.json")
    args = ap.parse_args()
    report = {"shape": [ROWS * COLS, *RES, PLANES], "topology": "CROSS"}
    for name, scene in scenes():
        report[name] = run_scene(name, scene)
        print(name, json.dumps(report[name]), flush=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(json.dumps(report, sort_keys=True))


if __name__ == "__main__":
    main()
