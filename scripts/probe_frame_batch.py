"""Probe: fold a FRAME axis into the kernel grids (vmap) vs lax.map.

CLAUDE.md's last untried perf idea: lax.map serializes frames — each
frame pays every kernel's fixed cost (grid prologue, pipeline warmup,
inter-kernel XLA glue). jax.vmap of a pallas_call instead PREPENDS a
grid dimension, so B frames run as one big grid per kernel and the
fixed costs amortize. Correctness is not free: the sweep kernels carry
state in VMEM scratch across their sequential grid axis and re-init at
program_id == 0 of that axis — with a prepended outer frame axis the
inner index still resets per frame, so the carry logic must hold.
This probe checks numeric equality vmap-vs-lax.map on device FIRST,
then times both via the two-batch-size slope (bench.py methodology).

RESULT (v5e via axon, 540x768x64 int8, B=2/10): vmap output is
bit-identical to lax.map (maxdiff 0.0) and compiles clean — but times at
PARITY: slope 2.210 vs 2.133 ms/frame, sustained 4.522 vs 4.462 (both
within tunnel noise). The per-kernel fixed cost the folding was meant to
amortize is evidently negligible at these grid sizes, and Mosaic streams
the same blocks either way. Dead end for speed; useful fact for memory:
vmap is SAFE on the full fused pipeline (scratch carries re-init
correctly under the prepended frame grid axis), so batched APIs can use
either form.
"""

import argparse
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)

H, W, D = 540, 768, 64


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--repeats", type=int, default=9)
    ap.add_argument("--batches", type=int, nargs=2, default=[2, 10])
    args = ap.parse_args()
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from stereovisionarray_tpu.config import CostConfig, SGMConfig
    from stereovisionarray_tpu.models.two_view import two_view_disparity

    cost = CostConfig(num_disparities=D, dtype="int8")
    sgm = SGMConfig(p1=8.0, p2=96.0, num_paths=8)

    def one(l, r):
        return two_view_disparity(l, r, cost, sgm).disparity

    @jax.jit
    def via_map(ls, rs):
        return jax.lax.map(lambda p: one(p[0], p[1]), (ls, rs))

    @jax.jit
    def via_vmap(ls, rs):
        return jax.vmap(one)(ls, rs)

    def data(n, seed):
        rng = np.random.default_rng(seed)
        base = rng.uniform(0, 255, (n, H, W + 32)).astype(np.float32)
        return (jax.device_put(jnp.asarray(base[..., :W])),
                jax.device_put(jnp.asarray(base[..., 32:])))

    # ---- correctness first: bit-compare on device ------------------------
    ls, rs = data(2, 0)
    a = np.asarray(via_map(ls, rs))
    try:
        b = np.asarray(via_vmap(ls, rs))
    except Exception as e:  # noqa: BLE001 — report Mosaic legality verbatim
        print("vmap FAILED to compile/run:", type(e).__name__)
        print(str(e)[:2000])
        return
    exact = np.array_equal(a, b)
    close = np.allclose(a, b, atol=0.51)
    print(f"vmap vs lax.map: exact={exact} close={close} "
          f"maxdiff={np.nanmax(np.abs(a - b)):.4f}")

    # ---- slope timing -----------------------------------------------------
    nb_s, nb_b = args.batches

    def fence(fn, arrs, salt):
        t0 = time.perf_counter()
        float(jnp.sum(fn(arrs[0] + salt, arrs[1])))
        return time.perf_counter() - t0

    for name, fn in [("lax.map", via_map), ("vmap", via_vmap)]:
        small, big = data(nb_s, 1), data(nb_b, 2)
        for k in range(3):
            fence(fn, small, 0.1 * k)
            fence(fn, big, 0.1 * k)
        ts, tb = [], []
        for i in range(args.repeats):
            ts.append(fence(fn, small, 1 + 0.1 * i))
            tb.append(fence(fn, big, 1.05 + 0.1 * i))
        per = (statistics.median(tb) - statistics.median(ts)) / (nb_b - nb_s)
        print(f"{name}: {per * 1e3:.3f} ms/frame (slope), "
              f"sustained {statistics.median(tb) / nb_b * 1e3:.3f} ms/frame")


if __name__ == "__main__":
    main()
