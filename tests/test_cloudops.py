"""Point-cloud post-processing (geometry/cloudops.py): voxel downsampling
and grid-density outlier removal."""

import numpy as np

from stereovisionarray_tpu.geometry.cloudops import remove_outliers, voxel_downsample


class TestVoxelDownsample:
    def test_one_point_per_cell(self):
        r = np.random.default_rng(0)
        pts = r.uniform(0, 1, (5000, 3)).astype(np.float32)
        out, w, _ = voxel_downsample(pts, voxel=0.25)
        assert out.shape[0] <= 4 * 4 * 4
        assert out.shape[0] > 50  # dense cloud occupies most cells
        assert np.allclose(w.sum(), 5000)  # weights conserved
        # every representative lies inside its voxel's bounding cube
        cell = np.floor(out / 0.25)
        lo, hi = cell * 0.25, (cell + 1) * 0.25
        assert (out >= lo - 1e-5).all() and (out <= hi + 1e-5).all()

    def test_weighted_centroid(self):
        pts = np.array([[0.1, 0.0, 0.0], [0.3, 0.0, 0.0]], np.float32)
        out, w, attr = voxel_downsample(
            pts, voxel=1.0, weights=np.array([3.0, 1.0]),
            attributes=np.array([10.0, 50.0]),
        )
        assert out.shape == (1, 3)
        np.testing.assert_allclose(out[0, 0], (0.1 * 3 + 0.3) / 4, atol=1e-6)
        np.testing.assert_allclose(w, [4.0])
        np.testing.assert_allclose(attr, [(10 * 3 + 50) / 4])

    def test_vector_attributes_and_empty(self):
        pts = np.zeros((4, 3), np.float32)
        attr = np.arange(8, dtype=np.float32).reshape(4, 2)
        out, w, a = voxel_downsample(pts, 0.5, attributes=attr)
        assert out.shape == (1, 3) and a.shape == (1, 2)
        np.testing.assert_allclose(a[0], attr.mean(axis=0))
        out0, w0, _ = voxel_downsample(np.zeros((0, 3)), 0.5)
        assert out0.shape[0] == 0 and w0.shape[0] == 0


class TestPlyChannels:
    def test_normals_quality_round_trip(self, tmp_path):
        from stereovisionarray_tpu.datasets import load_ply, save_ply

        r = np.random.default_rng(2)
        pts = r.uniform(-1, 1, (50, 3)).astype(np.float32)
        nrm = r.normal(size=(50, 3)).astype(np.float32)
        nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
        col = r.integers(0, 256, (50, 3)).astype(np.uint8)
        q = r.uniform(0, 1, 50).astype(np.float32)
        path = str(tmp_path / "c.ply")
        n = save_ply(path, pts, colors=col, normals=nrm, quality=q)
        assert n == 50
        pts2, col2 = load_ply(path)
        np.testing.assert_allclose(pts2, pts)
        np.testing.assert_array_equal(col2, col)
        # the generic record exposes the extra channels byte-exactly
        with open(path, "rb") as f:
            header = b""
            while not header.endswith(b"end_header\n"):
                header += f.read(1)
            rec = np.frombuffer(f.read(), dtype=[
                ("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                ("nx", "<f4"), ("ny", "<f4"), ("nz", "<f4"),
                ("red", "u1"), ("green", "u1"), ("blue", "u1"),
                ("quality", "<f4")], count=50)
        np.testing.assert_allclose(rec["nx"], nrm[:, 0])
        np.testing.assert_allclose(rec["quality"], q)


class TestRemoveOutliers:
    def test_isolated_speckle_dropped_surface_kept(self):
        r = np.random.default_rng(1)
        # dense planar surface + far-flung speckle
        surf = np.stack([
            r.uniform(0, 1, 4000), r.uniform(0, 1, 4000),
            0.5 + r.normal(0, 0.002, 4000),
        ], axis=-1)
        speckle = np.stack([
            r.uniform(0, 1, 30), r.uniform(0, 1, 30),
            r.uniform(5.0, 9.0, 30),
        ], axis=-1)
        pts = np.concatenate([surf, speckle]).astype(np.float32)
        keep = remove_outliers(pts, voxel=0.05, min_neighbors=3)
        assert keep[:4000].mean() > 0.99
        assert keep[4000:].mean() < 0.1

    def test_neighbouring_cells_count(self):
        # a tight cluster straddling a voxel boundary must survive
        pts = np.array([
            [0.49, 0.5, 0.5], [0.51, 0.5, 0.5],
            [0.5, 0.49, 0.5], [0.5, 0.51, 0.5], [0.5, 0.5, 0.5],
        ], np.float32)
        keep = remove_outliers(pts, voxel=0.02, min_neighbors=2)
        assert keep.all()
