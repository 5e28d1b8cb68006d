"""Probe Pallas blocked (H,D,W)->(W,D,H) transpose formulations on TPU.

Round-1 finding: a direct in-kernel jnp.transpose(block, (2,1,0)) makes
Mosaic materialize the FULL output on the kernel stack (51 MiB scoped-vmem
OOM).  This probes the per-d loop of native 2D transposes instead, plus
timing vs the XLA transpose.

Result (v5e): the 2D-loop formulation ALSO fails to legalize (Mosaic has no
i16 (128,128) 2D vector transpose either); the XLA transpose stays the
fastest available at ~0.32 ms slope-measured (~2.5x HBM SOL).
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
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

H, D, W = 540, 64, 768
BH = BW = 128


def _kernel_2dloop(in_ref, out_ref, *, d):
    def body(k, _):
        out_ref[:, k, :] = jnp.transpose(in_ref[:, k, :], (1, 0))
        return 0

    jax.lax.fori_loop(0, d, body, 0)


def transpose_2dloop(vol):
    h, d, w = vol.shape
    grid = (pl.cdiv(h, BH), pl.cdiv(w, BW))
    return pl.pallas_call(
        functools.partial(_kernel_2dloop, d=d),
        grid=grid,
        in_specs=[pl.BlockSpec((BH, d, BW), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BW, d, BH), lambda i, j: (j, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((w, d, h), vol.dtype),
    )(vol)


def fence(x):
    return float(jnp.sum(x.astype(jnp.int32)))


def time_fn(f, vol, n=24):
    prog = jax.jit(lambda v: jnp.sum(jax.lax.map(
        lambda s: f(v + s.astype(v.dtype)).astype(jnp.int32).sum(),
        jnp.arange(1, n + 1, dtype=jnp.int32))))
    float(prog(vol))
    ts = []
    for _ in range(7):
        t0 = time.perf_counter(); float(prog(vol)); ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2] / n * 1e3


rng = np.random.default_rng(0)
vol = jnp.asarray(rng.integers(0, 400, (H, D, W)).astype(np.int16))

try:
    out = transpose_2dloop(vol)
    ref = jnp.transpose(vol, (2, 1, 0))
    print("2dloop correct:", bool(jnp.array_equal(out, ref)))
    print(f"2dloop   {time_fn(transpose_2dloop, vol):.3f} ms")
except Exception as e:
    print("2dloop FAILS:", str(e).split(chr(10))[0][:160])

print(f"xla      {time_fn(lambda v: jnp.transpose(v, (2, 1, 0)), vol):.3f} ms")
