"""Probe which int8 ops Mosaic legalizes on this v5e, and whether an int8 cost
volume can halve the traffic of the two XLA volume transposes + sweep reads.

VERDICT r2 item 1: census 7x9 hamming <= 62 fits int8; the BT term quantizes
under COST_SCALE. Questions this probe answers:
  (a) Pallas: i8 VMEM load -> i32 compute (cast), i32 -> i8 store, i8 add,
      i8 select-under-mask — which legalize on this toolchain?
  (b) XLA: how fast is a (W,D,H) -> (H,D,W) transpose at int8 vs int16?
  (c) Pallas: does an i8-input kernel that casts rows to i32 on load run at
      the same speed as the i16 equivalent (i.e. is the cast free)?
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)


def probe(name, body, dtype=jnp.int8, out_dtype=None):
    out_dtype = out_dtype or dtype
    x = jnp.asarray(np.random.default_rng(0).integers(0, 60, (64, 768)), dtype)
    y = jnp.asarray(np.random.default_rng(1).integers(0, 60, (64, 768)), dtype)

    def kernel(x_ref, y_ref, o_ref):
        o_ref[:] = body(x_ref[:], y_ref[:])

    try:
        out = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x.shape, out_dtype),
        )(x, y)
        ref = body(x, y)
        ok = bool(jnp.array_equal(out, ref))
        print(f"{name:28s} COMPILES  correct={ok}", flush=True)
        return ok
    except Exception as e:
        msg = str(e).split("\n")[0][:110]
        print(f"{name:28s} FAILS     {msg}", flush=True)
        return False


print("=== (a) i8 op legality ===", flush=True)
probe("i8_add", lambda a, b: a + b)
probe("i8_minimum", lambda a, b: jnp.minimum(a, b))
probe("i8_where_lt", lambda a, b: jnp.where(a < b, a, b))
probe("i8_load_cast_i32", lambda a, b: a.astype(jnp.int32) + b.astype(jnp.int32),
      out_dtype=jnp.int32)
probe("i32_store_i8",
      lambda a, b: (a.astype(jnp.int32) + b.astype(jnp.int32)).astype(jnp.int8))
probe("i8_select_i32mask",
      lambda a, b: jnp.where(a.astype(jnp.int32) < b.astype(jnp.int32), a, b))

# sublane/lane shifts via concat (the barrel primitive) at i8
def _roll_sublane(a, b):
    return jnp.concatenate([a[-1:], a[:-1]], axis=0) + b


probe("i8_sublane_concat_roll", _roll_sublane)


def _roll_lane(a, b):
    return jnp.concatenate([a[:, -1:], a[:, :-1]], axis=1) + b


probe("i8_lane_concat_roll", _roll_lane)

print("=== (b) XLA transpose bandwidth i8 vs i16 vs i32 ===", flush=True)
W, D, H = 768, 64, 540


def bench_transpose(dtype):
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 60, (W, D, H)), dtype)

    @jax.jit
    def f(x):
        return jnp.transpose(x, (2, 1, 0))

    f(x).block_until_ready()
    # slope method: time k transposes inside one program via lax.map over a
    # small batch, vary inputs
    @jax.jit
    def many(xs):
        return jax.lax.map(lambda v: jnp.transpose(v, (2, 1, 0)).sum(
            dtype=jnp.int32), xs)

    for n in (2, 8):
        xs = jnp.stack([x + np.int8(i) if dtype == jnp.int8 else x + i
                        for i in range(n)])
        r = many(xs)
        r.block_until_ready()
        t0 = time.perf_counter()
        r = many(xs)
        float(r.sum())
        t1 = time.perf_counter()
        globals()[f"_t_{dtype.__name__}_{n}"] = t1 - t0
    n2, n8 = globals()[f"_t_{dtype.__name__}_2"], globals()[f"_t_{dtype.__name__}_8"]
    slope_ms = (n8 - n2) / 6 * 1e3
    nbytes = W * D * H * np.dtype(dtype).itemsize
    gbps = 2 * nbytes / (slope_ms * 1e-3) / 1e9 if slope_ms > 0 else float("inf")
    print(f"transpose {np.dtype(dtype).name:5s}: slope {slope_ms:6.3f} ms "
          f"({gbps:6.1f} GB/s rw)", flush=True)


for dt in (jnp.int8, jnp.int16, jnp.int32):
    bench_transpose(dt)
