"""Temporal stereo filter (models/temporal.py): noise averaging, motion
reset, hole persistence, and an end-to-end win over per-frame estimation on
a noisy synthetic stream."""

import numpy as np
import jax.numpy as jnp

from stereovisionarray_tpu.models.temporal import (
    temporal_filter_sequence,
    temporal_init,
    temporal_update,
)
from stereovisionarray_tpu.ops.wta import INVALID_DISPARITY

SHAPE = (16, 24)


def _const(v):
    return jnp.full(SHAPE, v, jnp.float32)


TRUE = jnp.ones(SHAPE, bool)
FALSE = jnp.zeros(SHAPE, bool)


class TestUpdateMechanics:
    def test_noise_averages_down(self):
        r = np.random.default_rng(0)
        gt = 12.0
        state = temporal_init(SHAPE)
        for _ in range(16):
            meas = _const(gt) + jnp.asarray(r.normal(0, 0.3, SHAPE).astype(np.float32))
            state, out = temporal_update(state, meas, TRUE, max_diff=2.0)
        err_f = np.abs(np.asarray(out.disparity) - gt)
        assert err_f.mean() < 0.3 / np.sqrt(6)  # clearly below 1-frame noise
        assert np.asarray(out.stability).min() == 1.0  # saturated evidence

    def test_motion_resets_without_ghosting(self):
        state = temporal_init(SHAPE)
        for _ in range(5):
            state, _ = temporal_update(state, _const(10.0), TRUE)
        state, out = temporal_update(state, _const(20.0), TRUE, max_diff=1.0)
        # one-frame latency, no blend across the jump
        np.testing.assert_allclose(np.asarray(out.disparity), 20.0)
        assert np.asarray(out.stability).max() < 0.5  # evidence restarted

    def test_hole_persistence_bounded(self):
        state = temporal_init(SHAPE)
        for _ in range(9):  # saturate evidence (max_weight 8)
            state, _ = temporal_update(state, _const(7.0), TRUE)
        ages = []
        coasted = []
        for k in range(5):
            state, out = temporal_update(state, _const(0.0), FALSE,
                                         max_hole_age=3)
            ages.append(bool(np.asarray(out.valid).all()))
            coasted.append(bool(np.asarray(out.coasted).all()))
        # a SATURATED pixel coasts the full max_hole_age, then drops
        assert ages == [True, True, True, False, False]
        assert coasted == ages  # every held frame is flagged as coasted
        assert (np.asarray(out.disparity) == float(INVALID_DISPARITY)).all()

    def test_hole_age_adapts_to_evidence(self):
        """r5: the coast age scales with PRE-COAST evidence (the weight
        halves per coasted frame and must stay >= 2*coast_min_weight) —
        a 2-frame-old pixel must NOT coast as long as a saturated one
        (VERDICT r4 item 6: fixed-age coasting polluted full-density
        accuracy at high noise)."""
        state = temporal_init(SHAPE)
        for _ in range(2):  # weight 2 only
            state, _ = temporal_update(state, _const(7.0), TRUE)
        ages = []
        for k in range(4):
            state, out = temporal_update(state, _const(0.0), FALSE,
                                         max_hole_age=3)
            ages.append(bool(np.asarray(out.valid).all()))
        assert ages == [True, False, False, False]

    def test_coasted_not_set_on_measured(self):
        state = temporal_init(SHAPE)
        state, out = temporal_update(state, _const(5.0), TRUE)
        assert not np.asarray(out.coasted).any()

    def test_confidence_weights_evidence(self):
        state_hi = temporal_init(SHAPE)
        state_lo = temporal_init(SHAPE)
        state_hi, _ = temporal_update(state_hi, _const(10.0), TRUE, _const(1.0))
        state_lo, _ = temporal_update(state_lo, _const(10.0), TRUE, _const(0.1))
        # same second measurement moves the low-confidence state further
        _, out_hi = temporal_update(state_hi, _const(11.0), TRUE, _const(1.0),
                                    max_diff=2.0)
        _, out_lo = temporal_update(state_lo, _const(11.0), TRUE, _const(1.0),
                                    max_diff=2.0)
        d_hi = float(np.asarray(out_hi.disparity)[0, 0])
        d_lo = float(np.asarray(out_lo.disparity)[0, 0])
        assert d_lo > d_hi  # weaker prior -> follows the new data more


class TestSequence:
    def test_scan_matches_loop(self):
        r = np.random.default_rng(1)
        t = 6
        d = jnp.asarray(r.uniform(5, 10, (t, *SHAPE)).astype(np.float32))
        v = jnp.asarray(r.uniform(size=(t, *SHAPE)) > 0.2)
        c = jnp.asarray(r.uniform(0.2, 1.0, (t, *SHAPE)).astype(np.float32))
        outs = temporal_filter_sequence(d, v, c, max_diff=20.0)
        state = temporal_init(SHAPE)
        for k in range(t):
            state, ref = temporal_update(state, d[k], v[k], c[k], max_diff=20.0)
            np.testing.assert_allclose(np.asarray(outs.disparity[k]),
                                       np.asarray(ref.disparity), atol=1e-6)
            np.testing.assert_array_equal(np.asarray(outs.valid[k]),
                                          np.asarray(ref.valid))

    def test_end_to_end_beats_per_frame(self):
        """Noisy stereo stream of a static scene: the filtered stream's
        bad-1.0 must beat the per-frame pipeline's."""
        from stereovisionarray_tpu.config import CostConfig, SGMConfig
        from stereovisionarray_tpu.models.two_view import two_view_disparity

        r = np.random.default_rng(2)
        h, w, D, d_true, T = 40, 72, 16, 6, 8
        base = r.uniform(0, 255, (h, w + d_true)).astype(np.float32)
        ccfg = CostConfig(num_disparities=D, census_window=(5, 5))
        scfg = SGMConfig(num_paths=4, uniqueness=0.9, lr_max_diff=1.25)
        ds, vs, cs = [], [], []
        for _ in range(T):
            nl = r.normal(0, 14, (h, w)).astype(np.float32)
            nr = r.normal(0, 14, (h, w)).astype(np.float32)
            out = two_view_disparity(
                jnp.asarray(base[:, :w] + nl),
                jnp.asarray(base[:, d_true:] + nr), ccfg, scfg)
            ds.append(out.disparity)
            vs.append(out.valid)
            cs.append(out.confidence)
        outs = temporal_filter_sequence(
            jnp.stack(ds), jnp.stack(vs), jnp.stack(cs), max_diff=1.5)
        inner = np.s_[4:-4, D:-4]

        def bad1(dmap, vmap):
            dd = np.asarray(dmap)[inner]
            vv = np.asarray(vmap)[inner]
            return (np.abs(dd - d_true) > 1.0)[vv].mean(), vv.mean()

        b_frame, dens_frame = bad1(ds[-1], vs[-1])
        b_filt, dens_filt = bad1(outs.disparity[-1], outs.valid[-1])
        assert dens_filt >= dens_frame  # holes filled, not created
        assert b_filt <= b_frame  # noise averaged down
        # and the filtered map is substantially cleaner in absolute terms
        assert b_filt < 0.05
