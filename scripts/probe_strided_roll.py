"""Probe: does ``pltpu.roll(x, shift, axis, stride=s, stride_axis=k)``
legalize on the v5e, and does it beat the hand-built log-doubling barrels?

Semantics under test (JAX 0.9 interpret-mode reference):
  out[i, x] = in[i, (x - (shift + stride * i)) mod W]   (axis=1, stride_axis=0)

If that holds and legalizes, it replaces:
  - ``cost_pallas._shifted_rows`` (census + BT barrels: ~80 rolled rows
    per (1, W) source row),
  - ``extract_pallas._barrel`` (the right-view diagonal skew: 6 full-slab
    roll+select steps = ~384 rolled rows per block row) via
    stride = W - 1 (descending shifts mod W),
  - ``extract_pallas._barrel_broadcast`` (plus one iota mask for the fill).

Usage: python scripts/probe_strided_roll.py [--cpu]
"""

import argparse
import functools
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"
)

D, W = 64, 768
ROWS = 540  # grid steps for the timing kernels


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="interpret mode on CPU")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interp = args.cpu

    def run_kernel(kernel, x, out_dtype=None):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, out_dtype or x.dtype),
            interpret=interp,
        )(x)

    rng = np.random.default_rng(0)

    # --- semantics: ascending stride (+1): row i -> right-roll by i ------- #
    for dt in (jnp.int16, jnp.int32, jnp.float32):
        x = jnp.asarray(rng.integers(0, 1000, size=(D, W)), dtype=dt)

        def k_asc(x_ref, o_ref):
            o_ref[:] = pltpu.roll(x_ref[:], 0, 1, stride=1, stride_axis=0)

        try:
            got = np.asarray(jax.jit(lambda x: run_kernel(k_asc, x))(x))
        except Exception as e:  # noqa: BLE001
            print(f"asc stride {np.dtype(dt).name}: FAIL {type(e).__name__}: {e}")
            continue
        ref = np.stack([np.roll(np.asarray(x)[i], i) for i in range(D)])
        print(f"asc stride {np.dtype(dt).name}: ok={np.array_equal(got, ref)}")

    # --- semantics: descending shifts via stride = W - 1 ----------------- #
    x = jnp.asarray(rng.integers(0, 1000, size=(D, W)), dtype=jnp.int32)

    def k_desc(x_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], 0, 1, stride=W - 1, stride_axis=0)

    try:
        got = np.asarray(jax.jit(lambda x: run_kernel(k_desc, x))(x))
        ref = np.stack([np.roll(np.asarray(x)[i], (-i) % W) for i in range(D)])
        print(f"desc (stride=W-1) int32: ok={np.array_equal(got, ref)}")
    except Exception as e:  # noqa: BLE001
        print(f"desc (stride=W-1) int32: FAIL {type(e).__name__}: {e}")

    # --- semantics: traced (dynamic) base shift with stride -------------- #
    def k_dyn(x_ref, o_ref):
        s = x_ref[0, 0].astype(jnp.int32) % W
        o_ref[:] = pltpu.roll(x_ref[:], s, 1, stride=1, stride_axis=0)

    try:
        got = np.asarray(jax.jit(lambda x: run_kernel(k_dyn, x))(x))
        s0 = int(np.asarray(x)[0, 0]) % W
        ref = np.stack([np.roll(np.asarray(x)[i], s0 + i) for i in range(D)])
        print(f"dynamic base shift int32: ok={np.array_equal(got, ref)}")
    except Exception as e:  # noqa: BLE001
        print(f"dynamic base shift int32: FAIL {type(e).__name__}: {e}")

    if args.cpu:
        return

    # --- timing: log-doubling barrel vs ONE strided roll ----------------- #
    # Both kernels consume a (ROWS, W) operand row-by-row and emit the
    # (D, W) barrel of each row, reduced to (1, W) so the grid stays tiny.
    from stereovisionarray_tpu.ops.cost_pallas import _shifted_rows

    def bench(kernel, tag):
        xs = jnp.asarray(
            rng.integers(0, 1000, size=(ROWS, W)), dtype=jnp.int32
        )

        def prog(xs):
            def body(x_ref, o_ref):
                def step(r, acc):
                    return acc + kernel(x_ref[r][None, :]).astype(jnp.int32).sum()

                o_ref[0, 0] = jax.lax.fori_loop(0, ROWS, step, jnp.int32(0))

            return pl.pallas_call(
                body,
                out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
                out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            )(xs)

        jprog = jax.jit(prog)
        float(jprog(xs)[0, 0])  # compile
        ts = []
        for i in range(7):
            xs2 = xs + i
            t0 = time.perf_counter()
            float(jprog(xs2)[0, 0])
            ts.append(time.perf_counter() - t0)
        print(f"{tag}: {min(ts) * 1e3:.3f} ms min / {statistics.median(ts) * 1e3:.3f} med")

    bench(lambda row: _shifted_rows(row, D, W), "log-doubling barrel x540")
    bench(
        lambda row: pltpu.roll(
            jnp.broadcast_to(row, (D, W)), 0, 1, stride=1, stride_axis=0
        ),
        "strided roll x540       ",
    )


if __name__ == "__main__":
    main()
