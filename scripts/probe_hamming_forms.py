"""Probe VPU formulations of the sweep kernel's hamming accumulation on
device (VERDICT r2 item 2).

First, the negative result: the suggested MXU contraction does NOT exist.
ham[p] = base[p] + sum_b sgn[b, p] * c[b, p] is a PER-PIXEL inner product
over the bit axis — both operands are indexed by the output coordinate, so
there is no free axis for a matmul to share (dot_general computes
out[i, j] = sum_k A[i, k] B[k, j]; here every output element needs its OWN
k-row of BOTH operands — that is an elementwise multiply + reduce, i.e.
VPU work, not MXU work). The warp one-hot trick worked because its
selector matrix is shared across a whole axis of the output; the census
signs are not.

What remains is op-count / scheduling tuning of the VPU loop. The current
form costs 3 ops/bit (cmp, select, add) on (h, w) f32 — this probe times:
  A. serial accumulate (the shipped form): acc = acc + where(c, sgn, 0)
  B. tree-sum: all 24 where() terms materialized, then a log-depth add
     tree (breaks the acc dependence chain; exact — all values are small
     integers in f32, so reassociation is lossless)
  C. 4-way multi-accumulator round-robin, summed at the end
  D. fma form: acc + sgn * c.astype(f32)
on a kernel that does ONLY the hamming (sources VMEM-resident, one
(h, w) compare target per grid step, 512 steps = the view-plane count of
the array pipeline at 4 views x 128 planes).
"""

import functools
import os
import statistics
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

H, W, M = 270, 360, 2
N_BITS = 24
STEPS = 512  # 4 views x 128 planes


def _kernel(src_ref, sgn_ref, base_ref, out_ref, *, form):
    d = pl.program_id(0)
    # a cheap per-step varying "warped" image (stands in for the lerp)
    wmg = src_ref[...] * (1.0 + 1e-4 * d)
    center = wmg[M : M + H, M : M + W]

    terms = []
    accs = [jnp.zeros((H, W), jnp.float32) for _ in range(4)]
    acc = jnp.zeros((H, W), jnp.float32)
    bit = 0
    for dy in range(-M, M + 1):
        for dx in range(-M, M + 1):
            if dy == 0 and dx == 0:
                continue
            nb = wmg[M + dy : M + dy + H, M + dx : M + dx + W]
            c = nb < center
            if form == "serial":
                acc = acc + jnp.where(c, sgn_ref[bit], 0.0)
            elif form == "tree":
                terms.append(jnp.where(c, sgn_ref[bit], 0.0))
            elif form == "acc4":
                k = bit % 4
                accs[k] = accs[k] + jnp.where(c, sgn_ref[bit], 0.0)
            elif form == "fma":
                acc = acc + sgn_ref[bit] * c.astype(jnp.float32)
            elif form == "fma_tree":
                terms.append(sgn_ref[bit] * c.astype(jnp.float32))
            elif form == "fma_acc4":
                k = bit % 4
                accs[k] = accs[k] + sgn_ref[bit] * c.astype(jnp.float32)
            bit += 1
    if form in ("tree", "fma_tree"):
        while len(terms) > 1:
            terms = [a + b for a, b in zip(terms[::2], terms[1::2])] + (
                [terms[-1]] if len(terms) % 2 else []
            )
        acc = terms[0]
    elif form in ("acc4", "fma_acc4"):
        acc = (accs[0] + accs[1]) + (accs[2] + accs[3])
    out_ref[0] = base_ref[...] + acc


def run(form):
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.uniform(0, 255, (H + 2 * M + 1, W + 2 * M + 1)),
                      jnp.float32)
    sgn = jnp.asarray(rng.choice([-1.0, 1.0], (N_BITS, H, W)), jnp.float32)
    base = jnp.asarray(rng.integers(0, 24, (H, W)), jnp.float32)

    resident = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    f = pl.pallas_call(
        functools.partial(_kernel, form=form),
        grid=(STEPS,),
        in_specs=[resident(src.shape), resident(sgn.shape),
                  resident(base.shape)],
        out_specs=pl.BlockSpec((1, H, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((STEPS, H, W), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
    )

    @jax.jit
    def prog(salt):
        return f(src + salt, sgn, base).sum()

    correct = None
    float(prog(0.0))  # compile
    ts = []
    for i in range(7):
        t0 = time.perf_counter()
        float(prog(float(i)))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts) * 1e3


ref_ms = None
for form in ("serial", "fma", "fma_tree", "fma_acc4", "fma", "serial"):
    try:
        ms = run(form)
        print(f"{form:8s} {ms:8.2f} ms / {STEPS} steps "
              f"({ms * 1e3 / STEPS:6.2f} us/step)", flush=True)
    except Exception as e:
        print(f"{form:8s} FAILS {str(e).splitlines()[0][:100]}", flush=True)
