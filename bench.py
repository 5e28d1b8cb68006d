"""Benchmark harness — prints ONE JSON line for the driver.

Metric: end-to-end two-view SGM disparity throughput in megapixels/second
(full pipeline per frame: census+BT int8 cost volume (H x W x 64), 8-path
Pallas SGM aggregation, fused WTA + subpixel + uniqueness + LR extraction)
on the available accelerator (TPU chip under axon; CPU otherwise).

Reproducibility design (VERDICT r1 item 1: the round-1 number of record was
23x below a local re-run of identical code):

 - per-frame DEVICE time is estimated by the two-batch-size SLOPE
   ``(T(B_big) - T(B_small)) / (B_big - B_small)`` — each dispatch through
   the axon tunnel carries a large, highly variable fixed latency
   (~15-200 ms observed) that the slope cancels exactly;
 - each timed dispatch is fenced by a host fetch of a scalar reduce
   (``block_until_ready`` does not reliably fence through the tunnel) and
   inputs vary per call so no transport-level caching can short-circuit;
 - warmup runs until two consecutive timings agree within 25% (or a cap),
   so compile + first-touch never pollute the sample;
 - the two batch sizes are timed in ALTERNATING order, medians are taken
   over many repeats, and the whole measurement is repeated until two
   estimates agree within 15% (max 4 rounds, median of all reported).

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so the
baseline is an operation-count model of its hot loop
(``/root/reference/src/CameraStereoVision.cpp:49-95``): per pixel it scans
~64 Bresenham candidates x 41x41-patch SAD (~2 ops/element) single-threaded
=> ~2.2e5 ops/pixel; at an optimistic 15 Gop/s scalar CPU that is
~0.07 MP/s. vs_baseline = measured / 0.07.
"""

import json
import os
import statistics
import time

import numpy as np

REF_EST_MPS = 0.07  # op-count model of the reference hot loop (docstring)

# Persistent compilation cache: the 8-path SGM program takes minutes to
# compile on the remote TPU but milliseconds to run; cache so repeat bench
# runs (and driver rounds) skip the compile.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")

H, W, D = 540, 768, 64  # reference working resolution class (0.5x renders)
B_SMALL, B_BIG = 2, 10  # frames per dispatch for the slope estimate
REPEATS = 12  # timed dispatches per batch size per round
MAX_WARMUP = 8
MAX_ROUNDS = 4


def _make_batch_fn(jax, jnp, batch_size):
    from stereovisionarray_tpu.config import CostConfig, SGMConfig
    from stereovisionarray_tpu.models.two_view import two_view_disparity

    # int8 raw cost volume: bit-parity-checked vs int16-upcast on device
    # (scripts/check_tpu_parity.py); within-run A/B 2.072 vs 2.180 ms/frame
    cost_cfg = CostConfig(num_disparities=D, census_window=(7, 9), dtype="int8")
    sgm_cfg = SGMConfig(p1=8.0, p2=96.0, num_paths=8, adaptive_p2=True)

    @jax.jit
    def batch(ls, rs):
        def one(pair):
            out = two_view_disparity(pair[0], pair[1], cost_cfg, sgm_cfg)
            return out.disparity
        return jnp.sum(jax.lax.map(one, (ls, rs)))

    rng = np.random.default_rng(batch_size)
    base = rng.uniform(0.0, 255.0, size=(batch_size, H, W + 32)).astype(np.float32)
    lefts = jax.device_put(jnp.asarray(base[..., :W]))
    rights = jax.device_put(jnp.asarray(base[..., 32:]))
    return batch, lefts, rights


def _timed(batch, lefts, rights, salt):
    """One fenced dispatch; inputs vary via `salt` to defeat any caching."""
    t0 = time.perf_counter()
    float(batch(lefts + salt, rights))
    return time.perf_counter() - t0


def _warmup(batch, lefts, rights):
    prev = _timed(batch, lefts, rights, 0.125)
    for k in range(MAX_WARMUP):
        cur = _timed(batch, lefts, rights, 0.25 + 0.01 * k)
        if abs(cur - prev) <= 0.25 * max(cur, prev):
            return
        prev = cur


def _measure_round(rnd, small, big):
    """Median dispatch time for each batch size, interleaved sampling."""
    ts, tb = [], []
    for i in range(REPEATS):
        salt = 1.0 + 0.1 * i + 10.0 * rnd
        ts.append(_timed(*small, salt))
        tb.append(_timed(*big, salt + 0.05))
    return statistics.median(ts), statistics.median(tb)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    small = _make_batch_fn(jax, jnp, B_SMALL)
    big = _make_batch_fn(jax, jnp, B_BIG)

    _warmup(*small)
    _warmup(*big)

    estimates = []  # per-frame seconds from the dispatch-overhead-free slope
    sustained = []  # big-batch frames/s (includes per-dispatch overhead)
    for rnd in range(MAX_ROUNDS):
        t_small, t_big = _measure_round(rnd, small, big)
        per_frame = (t_big - t_small) / (B_BIG - B_SMALL)
        sustained.append(t_big / B_BIG)
        if per_frame <= 0:
            # tunnel noise inverted the slope (documented failure mode) —
            # a clamped epsilon here would "agree" with a second bad round
            # and publish an absurd number of record; drop the round
            continue
        estimates.append(per_frame)
        if len(estimates) >= 2:
            lo, hi = min(estimates[-2:]), max(estimates[-2:])
            if hi - lo <= 0.15 * hi:
                break

    if not estimates:
        # every slope round was noise-inverted: fall back to the sustained
        # big-batch time, which still bounds true per-frame time from above
        estimates = [statistics.median(sustained)]
    per_frame = statistics.median(estimates)
    mps = H * W / per_frame / 1e6
    sustained_mps = H * W / statistics.median(sustained) / 1e6
    print(
        json.dumps(
            {
                "metric": "two_view_sgm_throughput",
                "value": round(mps, 3),
                "unit": "MP/s",
                "vs_baseline": round(mps / REF_EST_MPS, 1),
                "device_ms_per_frame": round(per_frame * 1e3, 3),
                "sustained_mps": round(sustained_mps, 3),
                "rounds": len(estimates),
                "shape": [H, W, D],
            }
        )
    )


if __name__ == "__main__":
    main()
