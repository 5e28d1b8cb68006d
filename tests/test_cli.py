"""CLI driver (cli.py): render -> depth -> calibrate round trip on a tiny
synthetic rig, plus config plumbing. The configurable replacement for the
reference's hard-coded ``main()``
(``/root/reference/src/CameraStereoVision.cpp:10-123``)."""

import json
import os

import numpy as np
import pytest

from stereovisionarray_tpu.cli import load_config, main


def _run(capsys, argv):
    rc = main(argv)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return rc, json.loads(out)


SMALL = [
    "--set", "camera.rows=3", "--set", "camera.cols=3",
    "--set", "plane_sweep.num_planes=32", "--set", "refine.radius=2",
    "--set", "refine.window=9", "--set", "sgm.num_paths=4",
]


@pytest.fixture(scope="module")
def rendered(tmp_path_factory):
    data = str(tmp_path_factory.mktemp("data"))
    rc = main(["render", "--output", data, "--resolution", "40", "56", *SMALL])
    assert rc == 0
    return data


def test_config_subcommand_overrides(capsys):
    rc = main(["config", "--set", "sgm.p1=11", "--set",
               "plane_sweep.topology=cross"])
    cfg = json.loads(capsys.readouterr().out)
    assert rc == 0
    assert cfg["sgm"]["p1"] == 11
    assert cfg["plane_sweep"]["topology"] == "cross"


def test_load_config_rejects_unknown_key():
    class A:
        config = None
        set = ["nonexistent.key=1"]

    with pytest.raises(KeyError):
        load_config(A())


def test_render_writes_views_and_gt(rendered):
    views = [f for f in os.listdir(rendered) if f.startswith("view_")]
    assert len(views) == 9
    assert os.path.exists(os.path.join(rendered, "ground_truth.npz"))


def test_depth_pipeline_cli(rendered, tmp_path, capsys):
    out_dir = str(tmp_path / "out")
    rc, result = _run(capsys, [
        "depth", "--input", rendered, "--output", out_dir, *SMALL,
    ])
    assert rc == 0
    assert result["valid_fraction"] > 0.5
    # GT found automatically -> error metrics present and sane
    assert result["median_rel_err"] < 0.05
    for artifact in ("depth.png", "disparity.png", "depth.npz", "cloud.ply",
                     "error.png", "metrics.jsonl"):
        assert os.path.exists(os.path.join(out_dir, artifact)), artifact


def test_reconstruct_cli(rendered, tmp_path, capsys):
    out_dir = str(tmp_path / "recon")
    rc, result = _run(capsys, [
        "reconstruct", "--input", rendered, "--output", out_dir,
        "--views", "3", "4", "--min-support", "2",
        "--rel-thresh", "0.02", *SMALL,
    ])
    assert rc == 0
    assert result["points"] > 500
    assert result["median_rel_err"] < 0.05
    assert result["mean_support"] >= 2.0
    for artifact in ("fused_cloud.ply", "fused.npz", "metrics.jsonl"):
        assert os.path.exists(os.path.join(out_dir, artifact)), artifact


def test_depth_cascade_cli(rendered, tmp_path, capsys):
    out_dir = str(tmp_path / "outc")
    rc, result = _run(capsys, [
        "depth", "--input", rendered, "--output", out_dir, *SMALL,
        "--cascade",
        "--set", "plane_sweep.cascade_fine_planes=16",
        "--set", "plane_sweep.cascade_band_step=4",
    ])
    assert rc == 0
    assert result["valid_fraction"] > 0.5
    assert result["median_rel_err"] < 0.05
    assert os.path.exists(os.path.join(out_dir, "depth.npz"))


def test_depth_rejects_wrong_rig_shape(rendered, tmp_path):
    with pytest.raises(SystemExit):
        main(["depth", "--input", rendered, "--output", str(tmp_path / "x")])


def test_two_view_cli(rendered, tmp_path, capsys):
    # neighbouring horizontal views of the rendered rig make a usable pair
    left = os.path.join(rendered, "view_004.png")
    right = os.path.join(rendered, "view_003.png")
    out_dir = str(tmp_path / "tv")
    rc, result = _run(capsys, [
        "two-view", "--left", left, "--right", right, "--output", out_dir,
        "--set", "cost.num_disparities=32", "--set", "sgm.num_paths=4",
        "--baseline", "0.05", "--focal-px", "416.0",
    ])
    assert rc == 0
    assert result["valid_fraction"] > 0.3
    assert os.path.exists(os.path.join(out_dir, "depth.png"))


def test_two_view_cascade_cli(rendered, tmp_path, capsys):
    left = os.path.join(rendered, "view_004.png")
    right = os.path.join(rendered, "view_003.png")
    out_dir = str(tmp_path / "tvc")
    rc, result = _run(capsys, [
        "two-view", "--left", left, "--right", right, "--output", out_dir,
        "--set", "cost.num_disparities=64", "--set", "sgm.num_paths=4",
        "--cascade", "--fine-disparities", "16", "--band-step", "4",
    ])
    assert rc == 0
    assert result["valid_fraction"] > 0.3
    assert os.path.exists(os.path.join(out_dir, "disparity.png"))


def test_calibrate_cli(rendered, tmp_path, capsys):
    out_dir = str(tmp_path / "cal")
    rc, result = _run(capsys, [
        "calibrate", "--input", rendered, "--output", out_dir, *SMALL,
        "--set", "sfm.max_features=128", "--set", "sfm.ba_iterations=8",
    ])
    assert rc == 0
    assert result["num_obs"] > 20
    assert result["mean_reproj_px"] < 2.0
    npz = np.load(os.path.join(out_dir, "calibration.npz"))
    assert npz["t"].shape[-1] == 3


def test_evaluate_cli(rendered, tmp_path, capsys):
    out_dir = str(tmp_path / "ev")
    main(["depth", "--input", rendered, "--output", out_dir, *SMALL])
    capsys.readouterr()
    rc, report = _run(capsys, [
        "evaluate", "--result", os.path.join(out_dir, "depth.npz"),
        "--ground-truth", os.path.join(rendered, "ground_truth.npz"),
        "--key", "depth", "--gt-key", "depths", "--gt-index", "4",
        "--tau", "0.01", "0.02",
    ])
    assert rc == 0
    assert report["gt_key"] == "depths"
    assert abs(report["masked_mean_err"]) < 0.01
    assert report["bad_0.02"] < 0.6  # tau in metres here (depth domain)


def test_serve_cli(rendered, tmp_path, capsys):
    """Stream the same rendered frame set twice through `serve`."""
    out_dir = str(tmp_path / "srv")
    rc, summary = _run(capsys, [
        "serve", rendered, rendered, "--output", out_dir, *SMALL,
    ])
    assert rc == 0
    assert summary["frames"] == 2
    for i in range(2):
        assert os.path.exists(os.path.join(out_dir, f"depth_{i:04d}.png"))
        assert os.path.exists(os.path.join(out_dir, f"depth_{i:04d}.npz"))
    assert os.path.exists(os.path.join(out_dir, "metrics.jsonl"))
