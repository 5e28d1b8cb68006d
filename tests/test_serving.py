"""Streaming serving loop (models/serving.py): decode -> device -> array
pipeline with bounded in-flight overlap."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from stereovisionarray_tpu.config import EngineConfig
from stereovisionarray_tpu.datasets import (
    SceneSpec,
    reference_rig,
    render_camera_array,
    save_png,
)
from stereovisionarray_tpu.models import (
    frame_sets_from_dirs,
    stream_depth_maps,
)


@pytest.fixture(scope="module")
def setup():
    rows = cols = 3
    res = (48, 64)
    cams = reference_rig(rows=rows, cols=cols, resolution=res)
    cfg = EngineConfig().override(**{
        "camera.rows": rows, "camera.cols": cols,
        "plane_sweep.num_planes": 32, "refine.radius": 2,
        "refine.window": 9, "sgm.num_paths": 4,
    })
    frames = []
    gts = []
    for seed in range(3):
        imgs, deps = render_camera_array(cams, res, SceneSpec(texture_seed=seed))
        frames.append(imgs)
        gts.append(deps)
    return cams, cfg, frames, gts


def test_stream_results_in_order_and_accurate(setup):
    cams, cfg, frames, gts = setup
    results = list(stream_depth_maps(iter(frames), cams, cfg, ref_index=4, depth=2))
    assert [r.index for r in results] == [0, 1, 2]
    for r, gt in zip(results, gts):
        valid = np.asarray(r.output.valid)
        inner = np.zeros_like(valid)
        inner[8:-8, 8:-8] = True
        sel = valid & inner
        rerr = (np.abs(np.asarray(r.output.depth) - gt[4]) / gt[4])[sel]
        assert np.median(rerr) < 0.02, r.index
        assert r.decode_s >= 0.0


def test_stream_temporal_wraps_and_converges(setup):
    """stream_temporal: same static scene streamed 3x -> filtered stream
    stays in order, stability grows, filtered depth stays accurate."""
    from stereovisionarray_tpu.models import array_baselines, stream_temporal
    from stereovisionarray_tpu.geometry.topology import PairTopology, camera_pairs

    cams, cfg, frames, gts = setup
    static = [frames[0]] * 3  # one scene, repeated (noise-free renders)
    pairs = camera_pairs(PairTopology(cfg.plane_sweep.topology),
                         rows=3, cols=3, center=4)
    src = tuple(int(b) for a, b in pairs if a == 4)
    _, b0 = array_baselines(cams, 4, src)
    f_px = float(np.asarray(cams.fx)[4])
    results = list(stream_temporal(
        stream_depth_maps(iter(static), cams, cfg, ref_index=4, depth=2),
        b0, f_px,
    ))
    assert [r.index for r in results] == [0, 1, 2]
    stab = [float(np.asarray(r.temporal.stability).mean()) for r in results]
    assert stab[0] < stab[1] < stab[2]  # evidence accumulates
    last = results[-1]
    valid = np.asarray(last.temporal.valid)
    inner = np.zeros_like(valid)
    inner[8:-8, 8:-8] = True
    sel = valid & inner
    rerr = (np.abs(np.asarray(last.depth) - gts[0][4]) / gts[0][4])[sel]
    assert np.median(rerr) < 0.02


def test_chunked_temporal_matches_wrapper(setup):
    """stream_depth_maps_chunked(temporal=...) — the filter scanned inside
    the chunked device program with state carried across chunks — must
    reproduce the host-side stream_temporal wrapper exactly (including
    across the chunk boundary and a ragged final chunk)."""
    from stereovisionarray_tpu.models import (
        TemporalParams,
        stream_depth_maps_chunked,
        stream_temporal,
    )

    cams, cfg, frames, gts = setup
    params = TemporalParams(baseline=0.05, focal_px=float(np.asarray(cams.fx)[4]))
    fused = list(stream_depth_maps_chunked(
        iter(frames), cams, cfg, ref_index=4, chunk=2, temporal=params,
    ))
    # same chunked pipeline program on both sides (lax.map vs standalone
    # jit compile differently — see the test below); only the filter's
    # location differs: in-program scan vs host-side wrapper
    ref = list(stream_temporal(
        stream_depth_maps_chunked(iter(frames), cams, cfg, ref_index=4,
                                  chunk=2),
        params.baseline, params.focal_px,
    ))
    assert [r.index for r in fused] == [0, 1, 2]
    for a, b in zip(fused, ref):
        np.testing.assert_allclose(np.asarray(a.temporal.disparity),
                                   np.asarray(b.temporal.disparity), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(a.temporal.valid),
                                      np.asarray(b.temporal.valid))
        np.testing.assert_allclose(np.asarray(a.depth), np.asarray(b.depth),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(a.temporal.stability),
                                   np.asarray(b.temporal.stability), atol=1e-5)


def test_chunked_stream_matches_per_set_and_orders(setup):
    """stream_depth_maps_chunked (K sets per jitted lax.map dispatch,
    VERDICT r2 item 3): in-order results identical to the per-set path,
    including a ragged final chunk (3 sets, chunk=2 -> one padded chunk
    whose padding must be dropped)."""
    from stereovisionarray_tpu.models import stream_depth_maps_chunked

    cams, cfg, frames, _ = setup
    per_set = list(stream_depth_maps(iter(frames), cams, cfg, ref_index=4))
    chunked = list(
        stream_depth_maps_chunked(iter(frames), cams, cfg, ref_index=4,
                                  chunk=2)
    )
    assert [r.index for r in chunked] == [0, 1, 2]
    assert len(chunked) == len(per_set)
    for a, b in zip(per_set, chunked):
        # the lax.map body and the standalone jit compile separately, so
        # XLA may fma-contract the float chain differently; the iterative
        # refine amplifies bit-level cost diffs into occasional half-step
        # candidate flips — assert tight statistical agreement, and that
        # each chunked result matches ITS OWN per-set frame (order check)
        da = np.asarray(a.output.refined_depth)
        db = np.asarray(b.output.refined_depth)
        rel = np.abs(da - db) / np.maximum(np.abs(da), 1e-6)
        assert np.median(rel) < 1e-3
        assert (rel < 0.05).mean() > 0.99
        va, vb = np.asarray(a.output.valid), np.asarray(b.output.valid)
        assert (va == vb).mean() > 0.99
        assert b.decode_s >= 0.0


def test_frame_sets_from_dirs_round_trip(setup, tmp_path):
    cams, cfg, frames, _ = setup
    dirs = []
    for i, imgs in enumerate(frames[:2]):
        d = str(tmp_path / f"frame_{i}")
        os.makedirs(d)
        for j, img in enumerate(imgs):
            save_png(os.path.join(d, f"view_{j:03d}.png"), img, vmin=0.0, vmax=255.0)
        dirs.append(d)
    stacks = list(frame_sets_from_dirs(dirs))
    assert len(stacks) == 2
    assert stacks[0].shape == frames[0].shape
    # PNG quantization only (8-bit)
    assert np.abs(stacks[0] - frames[0]).max() <= 1.0

    results = list(stream_depth_maps(iter(stacks), cams, cfg, ref_index=4))
    assert len(results) == 2
    assert np.isfinite(np.asarray(results[0].output.refined_depth)).all()


def test_chunked_serving_with_cascade_config(setup):
    """plane_sweep.cascade=true flows through the chunked serving program
    (serving only forwards cfg into array_depth_pipeline; this pins the
    composition end to end: coarse pass + banded fine sweep inside the
    lax.map chunk body)."""
    from stereovisionarray_tpu.models import stream_depth_maps_chunked

    cams, cfg, frames, gts = setup
    ccfg = cfg.override(**{
        "plane_sweep.cascade": True,
        "plane_sweep.cascade_coarse_factor": 2,
        "plane_sweep.cascade_fine_planes": 16,
        "plane_sweep.cascade_band_step": 4,
    })
    results = list(stream_depth_maps_chunked(
        iter(frames), cams, ccfg, ref_index=4, chunk=2
    ))
    assert [r.index for r in results] == [0, 1, 2]
    for r, gt in zip(results, gts):
        valid = np.asarray(r.output.valid)
        inner = np.zeros_like(valid)
        inner[8:-8, 8:-8] = True
        sel = valid & inner
        rerr = (np.abs(np.asarray(r.output.depth) - gt[4]) / gt[4])[sel]
        assert np.median(rerr) < 0.02, r.index
