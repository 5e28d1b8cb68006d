"""Scaling-efficiency measurement -> SCALING.json (VERDICT r1 item 8).

BASELINE.md's ">=80% frames/s scaling efficiency from 1 chip to a multi-host
v5e slice" cannot be measured directly in this environment (ONE physical TPU
chip behind the axon tunnel; no pod). This script produces the closest
auditable evidence and records its own limits:

 1. cpu_mesh: strong scaling of `sharded_two_view_disparity` on the virtual
    CPU mesh (1/2/4/8 devices, data-parallel over a fixed 8-frame batch).
    The host has ONLY 4 physical cores and the XLA CPU backend itself
    multithreads, so wall-clock efficiency here is a noisy LOWER bound for
    n <= 4 and not meaningful at n = 8 — but it does bound the collective /
    partitioning overhead the sharded program adds, which is the part of
    scaling this codebase controls.
 2. tpu_batch: single-chip batch-size scaling (marginal frame time at
    growing lax.map batch) — evidence that per-frame device time is flat,
    i.e. data-parallel replication across chips has no per-chip penalty.

Usage:
  python scripts/bench_scaling.py            # cpu_mesh section
  python scripts/bench_scaling.py --tpu      # add tpu_batch section
"""

import argparse
import json
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
REPO = os.path.normpath(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
OUT = os.path.join(REPO, "SCALING.json")

B, H, W, D = 8, 96, 192, 16
REPEATS = 3


def cpu_mesh_section():
    os.environ.setdefault("XLA_FLAGS", "")
    if "host_platform_device_count" not in os.environ["XLA_FLAGS"]:
        os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from stereovisionarray_tpu.config import CostConfig, SGMConfig
    from stereovisionarray_tpu.parallel.mesh import make_mesh
    from stereovisionarray_tpu.parallel.two_view import sharded_two_view_disparity

    cost_cfg = CostConfig(num_disparities=D, census_window=(7, 9))
    sgm_cfg = SGMConfig(p1=8.0, p2=96.0, num_paths=4, adaptive_p2=False)
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 255, size=(B, H, W + 32)).astype(np.float32)
    left = jnp.asarray(base[..., :W])
    right = jnp.asarray(base[..., 32:])

    rows = {}
    for n in (1, 2, 4, 8):
        mesh = make_mesh(n, 1, 1, devices=jax.devices()[:n])

        def run():
            out = sharded_two_view_disparity(
                left, right, mesh, cost_cfg, sgm_cfg, halo=16, backend="xla"
            )
            return float(jnp.sum(out.disparity))

        run()  # compile
        ts = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            run()
            ts.append(time.perf_counter() - t0)
        t = statistics.median(ts)
        rows[n] = {"wall_s": round(t, 3), "frames_per_s": round(B / t, 3)}
    t1 = rows[1]["wall_s"]
    for n, row in rows.items():
        row["strong_scaling_efficiency"] = round(t1 / (n * row["wall_s"]), 3)
    return {
        "workload": {"frames": B, "shape": [H, W, D], "mesh": "(n,1,1) data-parallel",
                     "backend": "xla", "halo": 16, "num_paths": 4},
        "physical_cores": os.cpu_count(),
        "caveat": "8 virtual devices share 4 physical cores and the XLA CPU "
                  "backend multithreads within a device: efficiency numbers "
                  "are a lower bound for n<=4 and not meaningful at n=8; "
                  "they bound the sharding/collective overhead only",
        "mesh_sizes": rows,
    }


def tpu_batch_section():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from stereovisionarray_tpu.config import CostConfig, SGMConfig
    from stereovisionarray_tpu.models.two_view import two_view_disparity

    cost_cfg = CostConfig(num_disparities=64, census_window=(7, 9), dtype="int16")
    sgm_cfg = SGMConfig(p1=8.0, p2=96.0, num_paths=8, adaptive_p2=True)
    h, w = 540, 768
    rng = np.random.default_rng(0)

    def make(batch):
        base = rng.uniform(0, 255, size=(batch, h, w + 32)).astype(np.float32)
        ls = jax.device_put(jnp.asarray(base[..., :w]))
        rs = jax.device_put(jnp.asarray(base[..., 32:]))

        @jax.jit
        def run(a, b):
            def one(pair):
                return two_view_disparity(pair[0], pair[1], cost_cfg, sgm_cfg).disparity
            return jnp.sum(jax.lax.map(one, (a, b)))

        return run, ls, rs

    def t_of(batch):
        run, ls, rs = make(batch)
        float(run(ls, rs)); float(run(ls + 0.5, rs))
        ts = []
        for i in range(REPEATS + 2):
            t0 = time.perf_counter()
            float(run(ls + (1.0 + i), rs))
            ts.append(time.perf_counter() - t0)
        return statistics.median(ts)

    batches = (1, 2, 4, 8)
    times = {b: t_of(b) for b in batches}
    # marginal per-frame time between consecutive batch sizes
    marg = {}
    bs = list(batches)
    for a, b in zip(bs, bs[1:]):
        marg[f"{a}->{b}"] = round((times[b] - times[a]) / (b - a) * 1e3, 3)
    return {
        "workload": {"shape": [h, w, 64], "backend": "pallas int16"},
        "dispatch_wall_s": {str(b): round(t, 3) for b, t in times.items()},
        "marginal_ms_per_frame": marg,
        "note": "flat marginal frame time across batch sizes shows the chip "
                "is fully utilized per frame: replicating frames across a "
                "data-parallel mesh adds no per-chip penalty, the basis of "
                "the >=80% multi-chip frames/s scaling target",
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--tpu", action="store_true", help="add tpu_batch section")
    args = parser.parse_args()

    report = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            report = json.load(f)
    if args.tpu:
        report["tpu_batch"] = tpu_batch_section()
    else:
        report["cpu_mesh"] = cpu_mesh_section()
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(json.dumps(report, sort_keys=True))


if __name__ == "__main__":
    main()
