"""Dataset layer tests: synthetic renderer geometry, PFM roundtrip, calib
parsing, deterministic listing."""

import os

import numpy as np
import pytest

from stereovisionarray_tpu.datasets import (
    SceneSpec,
    list_images_sorted,
    load_array,
    parse_calib,
    read_pfm,
    reference_rig,
    render_camera_array,
    render_view,
    save_array,
    save_png,
    write_pfm,
)


class TestSynthetic:
    def test_render_shapes_and_determinism(self):
        rig = reference_rig(resolution=(40, 56))
        imgs, deps = render_camera_array(rig, (40, 56))
        assert imgs.shape == (25, 40, 56)
        assert deps.shape == (25, 40, 56)
        imgs2, deps2 = render_camera_array(rig, (40, 56))
        np.testing.assert_array_equal(imgs, imgs2)
        np.testing.assert_array_equal(deps, deps2)

    def test_depth_layers(self):
        """Depth map must contain the background plane and the nearer patches
        at their configured camera-frame depths."""
        rig = reference_rig(resolution=(60, 80))
        scene = SceneSpec()
        _, dep = render_view(rig, 12, (60, 80), scene)
        cam_z = -0.75
        # background plane at z=0.25 -> camera depth 1.0 at the optical axis
        assert dep.max() == pytest.approx(0.25 - cam_z, rel=0.05)
        # nearest object (sphere front at z=0.18-0.045) must appear
        assert dep.min() <= (0.18 - 0.045) - cam_z + 0.02

    def test_views_differ_by_parallax(self):
        rig = reference_rig(resolution=(40, 56))
        scene = SceneSpec()
        img_c, _ = render_view(rig, 12, (40, 56), scene)
        img_l, _ = render_view(rig, 11, (40, 56), scene)
        assert not np.allclose(img_c, img_l)  # parallax
        # but same scene: means close
        assert abs(img_c.mean() - img_l.mean()) < 10.0

    def test_rendered_pair_is_geometrically_consistent(self):
        """Golden geometry check: warping view 11 into view 12 using the
        TRUE depth must reproduce view 12 almost everywhere (texture is
        Lambertian; only occlusion boundaries may differ)."""
        import jax.numpy as jnp

        from stereovisionarray_tpu.ops import warp_with_disparity
        from stereovisionarray_tpu.models import depth_to_disparity

        res = (48, 64)
        rig = reference_rig(resolution=res)
        scene = SceneSpec()
        img_c, dep_c = render_view(rig, 12, res, scene)
        img_l, _ = render_view(rig, 11, res, scene)
        baseline = float(np.linalg.norm(np.asarray(rig.centers)[12] - np.asarray(rig.centers)[11]))
        disp = depth_to_disparity(jnp.asarray(dep_c), baseline, float(rig.fx[12]))
        # camera 11 sits at smaller x than 12, so u_11 = u_12 + fx*B/z = u + d:
        # reconstructing view 12 gathers view 11 at +d along x.
        warped, ok = warp_with_disparity(jnp.asarray(img_l), disp, jnp.asarray([1.0, 0.0]))
        m = np.asarray(ok)
        err = np.median(np.abs(np.asarray(warped) - img_c)[m])
        assert err < 6.0  # interpolation-level agreement (texture is aliased
        # at this tiny test resolution; geometric error would be ~30)
        # wrong direction must be catastrophically worse — pins the convention
        wrong, ok2 = warp_with_disparity(jnp.asarray(img_l), disp, jnp.asarray([-1.0, 0.0]))
        err_wrong = np.median(np.abs(np.asarray(wrong) - img_c)[np.asarray(ok2)])
        assert err_wrong > 3.0 * err


class TestPFM:
    def test_roundtrip(self, tmp_path, rng):
        arr = rng.normal(size=(17, 23)).astype(np.float32)
        p = str(tmp_path / "x.pfm")
        write_pfm(p, arr)
        back = read_pfm(p)
        np.testing.assert_array_equal(back, arr)

    def test_roundtrip_color(self, tmp_path, rng):
        arr = rng.normal(size=(9, 11, 3)).astype(np.float32)
        p = str(tmp_path / "c.pfm")
        write_pfm(p, arr)
        np.testing.assert_array_equal(read_pfm(p), arr)

    def test_rejects_garbage(self, tmp_path):
        p = str(tmp_path / "bad.pfm")
        with open(p, "wb") as f:
            f.write(b"NOTPFM\n1 1\n-1\n\x00\x00\x00\x00")
        with pytest.raises(ValueError):
            read_pfm(p)


class TestCalib:
    def test_parse(self):
        text = """cam0=[3979.911 0 1244.772; 0 3979.911 1019.507; 0 0 1]
cam1=[3979.911 0 1369.115; 0 3979.911 1019.507; 0 0 1]
doffs=124.343
baseline=193.001
width=2964
height=1988
ndisp=280
"""
        c = parse_calib(text)
        assert c["ndisp"] == 280
        assert c["doffs"] == pytest.approx(124.343)
        assert c["cam0"].shape == (3, 3)
        assert c["cam0"][0, 0] == pytest.approx(3979.911)
        assert c["cam1"][0, 2] == pytest.approx(1369.115)


class TestIO:
    def test_sorted_listing(self, tmp_path):
        names = ["b.png", "a.png", "j.png", "c.txt", "d.jpg"]
        for n in names:
            (tmp_path / n).write_bytes(b"")
        got = [os.path.basename(p) for p in list_images_sorted(str(tmp_path))]
        assert got == ["a.png", "b.png", "d.jpg", "j.png"]

    def test_array_roundtrip(self, tmp_path, rng):
        p = str(tmp_path / "ckpt.npz")
        a = rng.normal(size=(4, 5)).astype(np.float32)
        save_array(p, {"depth": a}, metadata={"stage": "test"})
        arrays, meta = load_array(p)
        np.testing.assert_array_equal(arrays["depth"], a)
        assert meta["stage"] == "test"
        assert meta["version"] == 1

    def test_save_png(self, tmp_path, rng):
        import imageio.v3 as iio

        p = str(tmp_path / "img.png")
        save_png(p, rng.normal(size=(8, 8)))
        assert iio.imread(p).shape == (8, 8)


class TestEvalFixture:
    """The committed golden-eval scene (data/eval_scene) must stay loadable
    through the real Middlebury ingest path (scripts/make_eval_fixture.py
    regenerates it; EVAL_r02.json records the metrics)."""

    def test_committed_scene_loads(self):
        import os

        from stereovisionarray_tpu.datasets.middlebury import load_middlebury_pair

        folder = os.path.join(os.path.dirname(__file__), "..", "data", "eval_scene")
        pair = load_middlebury_pair(folder)
        assert pair.left.shape == (540, 720) == pair.right.shape
        assert pair.ndisp == 64
        assert pair.gt_disparity is not None
        v = pair.valid_gt
        assert v.mean() > 0.99
        gt = pair.gt_disparity[v]
        assert 30.0 < gt.min() < gt.max() < 62.0
        assert float(pair.calib["baseline"]) == 30.0  # mm


def test_scene_slants_and_textureless():
    """Round-5 scene-diversity fixtures: slanted planes intersect where
    expected (depth varies linearly across the rect) and textureless
    rects flatten the texture (EVAL_SCENES_r05 fixtures)."""
    import numpy as np

    from stereovisionarray_tpu.datasets import (
        SceneSpec, reference_rig, render_view,
    )

    cams = reference_rig(rows=1, cols=1, spacing=0.05, origin=(0.0, 0.0),
                         resolution=(90, 120))
    scene = SceneSpec(
        background_z=0.30,
        patches=(),
        sphere_radius=0.0,
        slants=((-0.05, 0.05, -0.05, 0.05, 0.10, 0.8, 0.0),),
        textureless=((0.06, 0.2, -0.2, 0.2, 0.0),),
    )
    img, depth = render_view(cams, 0, (90, 120), scene)
    # the slanted patch is nearer than background and its depth GROWS
    # with world x (dzdx > 0): compare two pixels straddling the center
    h, w = depth.shape
    c = depth[h // 2]
    # depths are camera-frame distances (rig at z=-0.75): background
    # reads ~1.05, the slant ~0.82-0.93
    assert c.min() < 1.0  # slant visible (nearer than background)
    sl = np.where(c < 1.0)[0]
    assert len(sl) > 10
    assert c[sl[-3]] > c[sl[2]]  # depth increases along +x on the slant
    # textureless region: much lower variance than textured area. The
    # rect x in [0.06, 0.2] at depth ~1.05 projects to u-cx ~ [9.5, 32]
    # px (fx ~ 167 at this 120-px sensor) -> columns ~72..90
    # (rows limited too: the rect's y-extent covers only |hy| < 0.2 ->
    # central ~2/3 of rows at this fy/depth)
    tex_var = img[30:60, : w // 3].std()
    flat_var = img[30:60, 72:88].std()
    assert flat_var < 0.25 * tex_var
