"""Cascade (coarse-to-fine) stereo tests.

The cascade replaces the reference's per-pixel depth-bracketed candidate
rasterization (``/root/reference/src/CameraStereoVision.cpp:60-73``) with a
static two-level pipeline; these tests pin (a) exact recovery of a large
constant disparity far outside the fine band, (b) agreement with the flat
full-range pipeline on a two-plane scene, (c) band-offset invariants."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from stereovisionarray_tpu.config import CostConfig, SGMConfig
from stereovisionarray_tpu.models.cascade import cascade_two_view_disparity
from stereovisionarray_tpu.models.two_view import two_view_disparity


def _texture(rng, h, w):
    """Smooth random texture with enough census structure to match."""
    t = rng.uniform(0.0, 1.0, (h, w)).astype(np.float32)
    for _ in range(2):
        t = (t + np.roll(t, 1, 0) + np.roll(t, -1, 0)) / 3.0
        t = (t + np.roll(t, 1, 1) + np.roll(t, -1, 1)) / 3.0
    return t


COST = CostConfig(num_disparities=128)
SGM = SGMConfig(p1=6.0, p2=64.0)


@pytest.fixture(scope="module")
def constant_pair():
    """right[u] = left[u + 72]: constant disparity 72 (way past Df=32)."""
    rng = np.random.default_rng(7)
    h, w, d0 = 64, 256, 72
    big = _texture(rng, h, w + d0)
    left = big[:, :w]
    right = big[:, d0 : w + d0]
    return left, right, d0


@pytest.fixture(scope="module")
def two_plane_pair():
    """Two fronto-parallel planes at disparities 40 and 88."""
    rng = np.random.default_rng(11)
    h, w = 64, 256
    big = _texture(rng, h, w + 128)
    u = np.arange(w)
    dr = np.where(u < w // 2, 40, 88)
    right = big[:, u + dr]
    left = big[:, :w]
    return left, right, w


class TestCascadeGolden:
    def test_constant_large_disparity(self, constant_pair):
        left, right, d0 = constant_pair
        out = cascade_two_view_disparity(
            jnp.asarray(left),
            jnp.asarray(right),
            COST,
            SGM,
            coarse_factor=4,
            fine_disparities=32,
            band_step=8,
        )
        # valid region: x >= d0, plus the cascade border strip — the coarse
        # pass is blind left of d0 and its blunders/upsample ramp extend
        # ~coarse_factor * (census half-window + ramp) ~= 32 px inward
        # (measured: bad columns end at x=97 for d0=72)
        x0 = d0 + 32
        d = np.asarray(out.disparity)[6:-6, x0:-6]
        v = np.asarray(out.valid)[6:-6, x0:-6]
        assert v.mean() > 0.9
        err = np.abs(d[v] - d0)
        assert np.median(err) < 0.5
        assert (err < 1.0).mean() > 0.97

    def test_two_plane_matches_flat_oracle(self, two_plane_pair):
        left, right, w = two_plane_pair
        flat = two_view_disparity(
            jnp.asarray(left), jnp.asarray(right), COST, SGM
        )
        casc = cascade_two_view_disparity(
            jnp.asarray(left),
            jnp.asarray(right),
            COST,
            SGM,
            coarse_factor=4,
            fine_disparities=32,
            band_step=8,
        )
        fd, fv = np.asarray(flat.disparity), np.asarray(flat.valid)
        cd, cv = np.asarray(casc.disparity), np.asarray(casc.valid)
        # exclude the occlusion gap (left x in [w/2+40, w/2+88)) plus a
        # coarse-ramp margin, the cascade border strip (x < 88+32), and
        # image borders; the surviving ROI is ~24% of the frame
        x = np.arange(w)[None, :]
        gap = (x >= w // 2 + 40 - 16) & (x < w // 2 + 88 + 16)
        interior = np.zeros_like(fv)
        interior[6:-6, 88 + 32 : -6] = True
        roi = interior & ~gap
        both = fv & cv & roi
        assert both.mean() > 0.15
        agree = np.abs(fd[both] - cd[both]) <= 1.0
        assert agree.mean() > 0.95, f"agree {agree.mean():.3f}"
        # cascade must not lose much coverage vs flat in the clean region
        assert cv[roi].mean() > 0.9 * fv[roi].mean()

    def test_two_plane_absolute_accuracy(self, two_plane_pair):
        left, right, w = two_plane_pair
        out = cascade_two_view_disparity(
            jnp.asarray(left),
            jnp.asarray(right),
            COST,
            SGM,
            coarse_factor=4,
            fine_disparities=32,
            band_step=8,
        )
        d, v = np.asarray(out.disparity), np.asarray(out.valid)
        x = np.arange(w)[None, :] * np.ones((left.shape[0], 1), int)
        gt = np.where(x < w // 2 + 40, 40.0, 88.0)
        # border strip: the coarse pass is blind left of the LOCAL
        # disparity, so each plane's usable region starts d_plane + 32 in
        seen = (
            ((x >= 40 + 32) & (x < w // 2 + 40 - 16))
            | ((x >= w // 2 + 88 + 16) & (x < w - 6))
        )
        seen[:6] = False
        seen[-6:] = False
        m = v & seen
        assert m.mean() > 0.25
        err = np.abs(d[m] - gt[m])
        assert np.median(err) < 0.5
        assert (err < 1.0).mean() > 0.95


class TestCascadeInvariants:
    def test_band_offset_quantized_and_bounded(self, constant_pair):
        left, right, _ = constant_pair
        out = cascade_two_view_disparity(
            jnp.asarray(left),
            jnp.asarray(right),
            COST,
            SGM,
            coarse_factor=4,
            fine_disparities=32,
            band_step=8,
        )
        off = np.asarray(out.band_offset)
        assert (off % 8 == 0).all()
        assert off.min() >= 0
        assert off.max() <= 128 - 32
        # fine+offset stays inside the declared total range
        d = np.asarray(out.disparity)[np.asarray(out.valid)]
        assert d.min() >= 0.0 and d.max() < 128.0

    def test_confidence_plumbed(self, constant_pair):
        left, right, _ = constant_pair
        out = cascade_two_view_disparity(
            jnp.asarray(left), jnp.asarray(right), COST, SGM
        )
        assert out.confidence is not None
        c = np.asarray(out.confidence)
        assert c.shape == left.shape
        v = np.asarray(out.valid)
        assert (c[v] >= 0.0).all() and (c[v] <= 1.0).all()

    def test_depth_output(self, constant_pair):
        left, right, d0 = constant_pair
        out = cascade_two_view_disparity(
            jnp.asarray(left),
            jnp.asarray(right),
            COST,
            SGM,
            baseline=0.05,
            focal_px=1440.0,
        )
        z = np.asarray(out.depth)
        v = np.asarray(out.valid)[:, d0 + 6 :]
        zz = z[:, d0 + 6 :][v]
        np.testing.assert_allclose(
            np.median(zz), 0.05 * 1440.0 / d0, rtol=0.02
        )

    def test_rejects_degenerate_configs(self, constant_pair):
        left, right, _ = constant_pair
        with pytest.raises(ValueError):
            cascade_two_view_disparity(
                jnp.asarray(left),
                jnp.asarray(right),
                CostConfig(num_disparities=32),
                SGM,
                fine_disparities=32,
            )
        with pytest.raises(ValueError):
            cascade_two_view_disparity(
                jnp.asarray(left),
                jnp.asarray(right),
                COST,
                SGM,
                fine_disparities=12,
                band_step=8,
            )
