"""Probe which int16 elementwise ops Mosaic legalizes on this TPU.

Round-2 finding: arith.minsi on packed i16 (vector<8x128x2xi16>) fails to
legalize on v5e — this script checks the alternatives (cmp+select min,
add, sub, shifts) so the narrow-compute design space is known, not guessed.
"""

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)


def probe(name, body):
    x = jnp.asarray(np.random.default_rng(0).integers(0, 100, (64, 768)), jnp.int16)
    y = jnp.asarray(np.random.default_rng(1).integers(0, 100, (64, 768)), jnp.int16)

    def kernel(x_ref, y_ref, o_ref):
        o_ref[:] = body(x_ref[:], y_ref[:])

    try:
        out = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int16),
        )(x, y)
        ref = body(x, y)
        ok = bool(jnp.array_equal(out, ref))
        print(f"{name:24s} COMPILES  correct={ok}")
    except Exception as e:
        msg = str(e).split("\n")[0][:100]
        print(f"{name:24s} FAILS     {msg}")


probe("minimum", lambda a, b: jnp.minimum(a, b))
probe("where_lt_min", lambda a, b: jnp.where(a < b, a, b))
probe("add", lambda a, b: a + b)
probe("compare_to_i32sel", lambda a, b: jnp.where(a < b, jnp.int16(1), jnp.int16(0)))
probe("maximum", lambda a, b: jnp.maximum(a, b))
