"""8-path SGM aggregation as Pallas TPU kernels.

The XLA-scan version (``ops/sgm.py``) materializes 8 independent scans, each
re-reading the cost volume from HBM and writing its own path volume (~60 ms
at 540x768x64). These kernels restructure the work the TPU way:

 - one *sweep* kernel handles all paths sharing a scan direction: the
   vertical sweep fuses the axis-aligned path and both diagonals (3 carries
   in VMEM), so the volume is read ONCE per sweep and one partial sum is
   written — 4 sweeps total (down-ish, up-ish, and the two horizontal
   sweeps on the transposed volume) instead of 8 full scans;
 - the carry is a (W, D) [or (H, D)] wavefront resident in VMEM scratch —
   grid steps on TPU execute sequentially, so scratch persists row to row
   (SURVEY.md §7: "the carry is the D-vector per pixel-front");
 - the reverse-direction sweep is the same kernel with a reversed
   BlockSpec index map — no host-side flips, no extra HBM traffic;
 - diagonal carries shift one column per row inside VMEM (a sublane roll,
   no memory traffic).

Cost: 4 x (read row + write row) = 8 volume-passes -> 2.7 GB/s-class HBM
traffic at 540x768x64 f32 vs the scan version's 16+; measured ~6x faster on
a v5e chip. Numerics match ``sgm_aggregate`` to float-sum reordering
(verified in tests/test_sgm_pallas.py, interpret mode on CPU).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stereovisionarray_tpu.ops.sgm import _edge_p2

_BIG = 1e9  # python float: jnp scalars become captured consts inside pallas kernels
_BIG_INT = 16000  # int16 sentinel: survives +P1/+P2 without overflow


def _big_for(dtype) -> float:
    return _BIG_INT if jnp.issubdtype(dtype, jnp.integer) else _BIG


def _compute_dtype(dtype):
    """In-kernel compute dtype: integer volumes compute in int32 (Mosaic
    legalizes no i16/i8 arithmetic beyond add/shift on v5e —
    scripts/probe_i16_ops.py, scripts/probe_i8_ops.py)."""
    dt = jnp.dtype(dtype)
    return jnp.int32 if jnp.issubdtype(dt, jnp.integer) else dt


def _sum_dtype(dtype):
    """HBM dtype for PATH SUMS over a raw cost volume dtype. int8 raw
    costs (cost_scale 1, max 70) keep their sums in int16: one path is
    bounded by cost+P2 (~166) and the 8-path total by ~1330 — past int8
    but far inside int16. Other dtypes sum in themselves."""
    dt = jnp.dtype(dtype)
    return jnp.int16 if dt == jnp.int8 else dt


def _const(x, like):
    """Static scalar cast to `like`'s dtype (prevents weak-float promotion
    of int16 volumes inside the kernels)."""
    return jnp.asarray(x, like.dtype)


def _recurrence(prev, cost, p1, p2):
    """One SGM step on a (N, D) front (identical math to ops/sgm._step)."""
    p1 = _const(p1, prev)
    one = _const(1, prev)
    prev_min = jnp.min(prev, axis=-1, keepdims=True)
    up = jnp.concatenate([prev[:, :1] + p1 + one, prev[:, :-1] + p1], axis=-1)
    dn = jnp.concatenate([prev[:, 1:] + p1, prev[:, -1:] + p1 + one], axis=-1)
    best = jnp.minimum(jnp.minimum(prev, prev_min + p2), jnp.minimum(up, dn))
    return cost + (best - prev_min)


def _shift_front(front: jnp.ndarray, direction: int) -> jnp.ndarray:
    """Shift a (N, D) carry one position along N, BIG-filling the border
    (fresh path start — matches ops/sgm._scan_along_axis0's diag handling)."""
    pad = jnp.full_like(front[:1], _big_for(front.dtype))
    if direction > 0:
        return jnp.concatenate([pad, front[:-1]], axis=0)
    return jnp.concatenate([front[1:], pad], axis=0)


def _sweep_kernel_diag(vol_ref, p2_ref, out_ref, c0, c1, c2, *, p1):
    """Axis path + both diagonals: 3 carries, used by vertical sweeps."""
    i = pl.program_id(0)
    row = vol_ref[0]  # (N, D)
    p2 = p2_ref[0]  # (N, 1)

    @pl.when(i == 0)
    def _():
        c0[:] = row
        c1[:] = row
        c2[:] = row
        out_ref[0] = _const(3, row) * row

    @pl.when(i > 0)
    def _():
        l0 = _recurrence(c0[:], row, p1, p2)
        l1 = _recurrence(_shift_front(c1[:], +1), row, p1, p2)
        l2 = _recurrence(_shift_front(c2[:], -1), row, p1, p2)
        c0[:] = l0
        c1[:] = l1
        c2[:] = l2
        out_ref[0] = l0 + l1 + l2


def _sweep_kernel_axis(vol_ref, p2_ref, out_ref, c0, *, p1):
    """Axis-aligned path only: 1 carry, used by horizontal sweeps."""
    i = pl.program_id(0)
    row = vol_ref[0]
    p2 = p2_ref[0]

    @pl.when(i == 0)
    def _():
        c0[:] = row
        out_ref[0] = row

    @pl.when(i > 0)
    def _():
        l0 = _recurrence(c0[:], row, p1, p2)
        c0[:] = l0
        out_ref[0] = l0


def _sweep(vol, p2_map, p1, reverse: bool, diagonals: bool, interpret: bool):
    """Run one sweep over axis 0 of vol (S, N, D). p2_map: (S, N).

    TPU tiling note: every BlockSpec's last two dims must be divisible by
    (8, 128) or equal to the full array dims — p2 is therefore fed as
    (S, N, 1) so its block (1, n, 1) ends in (n, 1) (n % 8 == 0 after the
    caller's padding, trailing 1 == full dim), and D must be a multiple of
    128 or the whole axis (the cost-volume builder's D=64/128 both satisfy
    this since the block spans all of D)."""
    s, n, d = vol.shape
    if reverse:
        idx3 = lambda i: (s - 1 - i, 0, 0)
    else:
        idx3 = lambda i: (i, 0, 0)

    kernel = _sweep_kernel_diag if diagonals else _sweep_kernel_axis
    n_carries = 3 if diagonals else 1
    return pl.pallas_call(
        functools.partial(kernel, p1=float(p1)),
        grid=(s,),
        in_specs=[
            pl.BlockSpec((1, n, d), idx3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, 1), idx3, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, d), idx3, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(vol.shape, vol.dtype),
        scratch_shapes=[pltpu.VMEM((n, d), vol.dtype)] * n_carries,
        # scoped-vmem cap: blocks scale with D; the default 16 MB limit
        # OOMs at D=256 (cascade flat-oracle); v5e has 128 MB
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(vol, p2_map[..., None])


# --------------------------------------------------------------------- #
# (H, D, W) fast path: W (the image width) on the 128-lane axis, D on
# sublanes. With the default D=64 the (W, D) layout above leaves half of
# every vector register empty; here lanes are full, the d±1 couplings are
# sublane shifts, and the diagonal column shift is a lane shift. Blocks
# carry `rows` image rows per grid step (fori-free static unroll) to
# amortize per-step DMA/dispatch overhead.
# --------------------------------------------------------------------- #


def _recurrence_dw(prev, cost, p1, p2):
    """One SGM step on a (D, N) front; p2: (1, N).

    Border sentinel: the d=0 "up" neighbour (d-1) and d=D-1 "down"
    neighbour (d+1) do not exist. ANY fill >= prev[d] is exact there,
    because prev[d] itself is a candidate of the same min and p1 > 0 —
    the classical prev[d] + p1 + 1 sentinel never wins. BIG-filling lets
    the +p1 hoist OUT of the concats: one fat add on min(up, dn) instead
    of one per branch (the VPU, not HBM, bounds the vertical sweeps)."""
    p1 = _const(p1, prev)
    big = jnp.full_like(prev[:1], _big_for(prev.dtype))
    prev_min = jnp.min(prev, axis=0, keepdims=True)  # (1, N)
    up = jnp.concatenate([big, prev[:-1]], axis=0)
    dn = jnp.concatenate([prev[1:], big], axis=0)
    best = jnp.minimum(
        jnp.minimum(prev, prev_min + p2), jnp.minimum(up, dn) + p1
    )
    return cost + (best - prev_min)


def _shift_lanes(front: jnp.ndarray, direction: int) -> jnp.ndarray:
    """Shift a (D, N) carry one position along N (lanes), BIG border."""
    pad = jnp.full_like(front[:, :1], _big_for(front.dtype))
    if direction > 0:
        return jnp.concatenate([pad, front[:, :-1]], axis=1)
    return jnp.concatenate([front[:, 1:], pad], axis=1)


def _sweep_kernel_hdw(vol_ref, p2_ref, *rest, p1, rows, reverse, diagonals,
                      accumulate):
    """One sweep block: `rows` recurrence steps on (D, N) fronts.

    rest = ([acc_ref,] out_ref, *carries): when `accumulate`, an extra input
    operand holds a previously-swept volume and is ALIASED to the output
    (input_output_aliases) — the kernel writes acc + sweep, fusing the
    pairwise volume add that XLA would otherwise run as its own
    HBM pass. carries: 3 VMEM scratch fronts (axis, diag+1, diag-1) when
    diagonals, else 1. Reverse sweeps traverse the block's rows bottom-up
    (the grid index map already hands blocks in reverse order).

    int16 volumes: HBM blocks stay int16 (half the traffic) but compute
    and carries run in int32 — Mosaic has no int16 reductions; the
    casts happen on the VMEM-resident row only."""
    if accumulate:
        acc_ref, out_ref, *carries = rest
    else:
        acc_ref = None
        out_ref, *carries = rest
    i = pl.program_id(0)
    compute_dtype = _compute_dtype(vol_ref.dtype)
    store = (lambda x: x.astype(out_ref.dtype)) if compute_dtype != out_ref.dtype else (lambda x: x)
    order = range(rows - 1, -1, -1) if reverse else range(rows)
    first_r = order[0] if rows else 0
    for r in order:
        row = vol_ref[r].astype(compute_dtype)  # (D, N)
        p2 = p2_ref[r].astype(compute_dtype)  # (1, N)
        acc = acc_ref[r].astype(compute_dtype) if accumulate else None
        if r == first_r:
            @pl.when(i == 0)
            def _(row=row, acc=acc):
                for c in carries:
                    c[:] = row
                first = _const(len(carries), row) * row
                out_ref[r] = store(first if acc is None else acc + first)

            @pl.when(i > 0)
            def _(row=row, p2=p2, r=r, acc=acc):
                _sweep_step(row, p2, out_ref, carries, p1, diagonals, r, store, acc)
        else:
            _sweep_step(row, p2, out_ref, carries, p1, diagonals, r, store, acc)


def _sweep_step(row, p2, out_ref, carries, p1, diagonals, r, store=lambda x: x,
                acc=None):
    if diagonals:
        c0, c1, c2 = carries
        l0 = _recurrence_dw(c0[:], row, p1, p2)
        l1 = _recurrence_dw(_shift_lanes(c1[:], +1), row, p1, p2)
        l2 = _recurrence_dw(_shift_lanes(c2[:], -1), row, p1, p2)
        c0[:] = l0
        c1[:] = l1
        c2[:] = l2
        total = l0 + l1 + l2
    else:
        (c0,) = carries
        l0 = _recurrence_dw(c0[:], row, p1, p2)
        c0[:] = l0
        total = l0
    out_ref[r] = store(total if acc is None else acc + total)


def _carry_dtype(dtype):
    """VMEM carry dtype: integer volumes carry in int32 (no int16/int8
    reductions in Mosaic); everything else carries in its own dtype."""
    return _compute_dtype(dtype)


# sweep grid block size target: 12 beat 8 on the stacked sweep (0.353 ->
# 0.292 ms; 540 and 768 both divide by 12) and 16/24/32 measured worse at
# round 2 (scripts/probe_block_rows.py). Module-level so probes can A/B.
_BLOCK_TARGET = 12


def _block_rows(s: int, target: int = None) -> int:
    target = _BLOCK_TARGET if target is None else target
    for r in range(min(target, s), 0, -1):
        if s % r == 0:
            return r
    return 1


def _sweep_hdw(vol, p2_map, p1, reverse: bool, diagonals: bool, interpret: bool,
               acc=None):
    """One sweep along axis 0 of vol (S, D, N); p2_map (S, N).

    acc: optional previously-swept (S, D, N) volume to accumulate into —
    aliased to the output, so the pairwise add costs no extra HBM pass."""
    s, d, n = vol.shape
    rows = _block_rows(s)
    nblocks = s // rows
    idx = (lambda i: (nblocks - 1 - i, 0, 0)) if reverse else (lambda i: (i, 0, 0))
    n_carries = 3 if diagonals else 1
    operands = [vol, p2_map[:, None, :]]
    in_specs = [
        pl.BlockSpec((rows, d, n), idx, memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, 1, n), idx, memory_space=pltpu.VMEM),
    ]
    aliases = {}
    if acc is not None:
        operands.append(acc)
        in_specs.append(pl.BlockSpec((rows, d, n), idx, memory_space=pltpu.VMEM))
        aliases = {2: 0}
    out_dtype = acc.dtype if acc is not None else _sum_dtype(vol.dtype)
    return pl.pallas_call(
        functools.partial(
            _sweep_kernel_hdw, p1=float(p1), rows=rows, reverse=reverse,
            diagonals=diagonals, accumulate=acc is not None,
        ),
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rows, d, n), idx, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(vol.shape, out_dtype),
        scratch_shapes=[pltpu.VMEM((d, n), _carry_dtype(vol.dtype))] * n_carries,
        input_output_aliases=aliases,
        # scoped-vmem cap: blocks scale with D; the default 16 MB limit
        # OOMs at D=256 (cascade flat-oracle); v5e has 128 MB
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(*operands)


def _sweep_kernel_hdw_bidir(vol_f_ref, vol_b_ref, p2_f_ref, p2_b_ref,
                            out_f_ref, out_b_ref, *carries, p1, rows,
                            diagonals):
    """Forward + backward sweeps in ONE grid traversal: step i processes
    block i of the forward direction and block (nblocks-1-i) of the
    backward one (handed in by the two index maps). Twice the independent
    work per step — better DMA/compute overlap, half the kernel launches.
    carries: first half forward, second half backward."""
    i = pl.program_id(0)
    k = len(carries) // 2
    fwd, bwd = carries[:k], carries[k:]
    for r in range(rows):
        row_f = vol_f_ref[r]
        p2_f = p2_f_ref[r]
        rb = rows - 1 - r
        row_b = vol_b_ref[rb]
        p2_b = p2_b_ref[rb]
        if r == 0:
            @pl.when(i == 0)
            def _(row_f=row_f, row_b=row_b):
                for c in fwd:
                    c[:] = row_f
                for c in bwd:
                    c[:] = row_b
                out_f_ref[0] = _const(k, row_f) * row_f
                out_b_ref[rows - 1] = _const(k, row_b) * row_b

            @pl.when(i > 0)
            def _(row_f=row_f, p2_f=p2_f, row_b=row_b, p2_b=p2_b, r=r, rb=rb):
                _sweep_step(row_f, p2_f, out_f_ref, fwd, p1, diagonals, r)
                _sweep_step(row_b, p2_b, out_b_ref, bwd, p1, diagonals, rb)
        else:
            _sweep_step(row_f, p2_f, out_f_ref, fwd, p1, diagonals, r)
            _sweep_step(row_b, p2_b, out_b_ref, bwd, p1, diagonals, rb)


def _sweep_hdw_bidir(vol, p2_map, p1, diagonals: bool, interpret: bool):
    """Both sweep directions along axis 0 of vol (S, D, N) in one kernel.

    Returns (forward_out, backward_out), each (S, D, N)."""
    s, d, n = vol.shape
    rows = _block_rows(s)
    nblocks = s // rows
    idx_f = lambda i: (i, 0, 0)
    idx_b = lambda i: (nblocks - 1 - i, 0, 0)
    k = 3 if diagonals else 1
    shape = jax.ShapeDtypeStruct(vol.shape, vol.dtype)
    return pl.pallas_call(
        functools.partial(
            _sweep_kernel_hdw_bidir, p1=float(p1), rows=rows, diagonals=diagonals
        ),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((rows, d, n), idx_f, memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, d, n), idx_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1, n), idx_f, memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1, n), idx_b, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rows, d, n), idx_f, memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, d, n), idx_b, memory_space=pltpu.VMEM),
        ),
        out_shape=(shape, shape),
        scratch_shapes=[pltpu.VMEM((d, n), vol.dtype)] * (2 * k),
        # scoped-vmem cap: blocks scale with D; the default 16 MB limit
        # OOMs at D=256 (cascade flat-oracle); v5e has 128 MB
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(vol, vol, p2_map[:, None, :], p2_map[:, None, :])


def transpose_hdw(vol, interpret: bool = False):
    """(H, D, W) -> (W, D, H), via XLA.

    A Pallas blocked transpose does NOT legalize on v5e in any tested
    formulation — Mosaic materializes the full output on the kernel stack
    (51 MiB scoped-vmem OOM at 540x768x64 int16); see
    scripts/probe_transpose.py for the probes (3D block and per-d 2D loop).
    XLA's int16 3D transpose runs ~0.32 ms (~2.5x HBM SOL) at that shape —
    the known remaining gap in the aggregate stage."""
    del interpret
    return jnp.transpose(vol, (2, 1, 0))


def transpose_add_hdw(vert, horiz, interpret: bool = False):
    """vert (H, D, W) + transpose(horiz (W, D, H)) -> (H, D, W), via XLA
    (fuses into one pass; a Pallas version cannot legalize — see
    ``transpose_hdw``)."""
    del interpret
    return vert + jnp.transpose(horiz, (2, 1, 0))


# hdw sweep name -> ops.sgm path ids (the unit of path parallelism for the
# Pallas backend under shard_map — parallel/two_view.py splits sweeps, not
# individual paths, since one sweep kernel fuses its direction group)
SWEEP_PATHS_8 = {"down": (0, 4, 5), "up": (1, 6, 7), "lr": (2,), "rl": (3,)}
SWEEP_PATHS_4 = {"down": (0,), "up": (1,), "lr": (2,), "rl": (3,)}
ALL_SWEEPS = ("down", "up", "lr", "rl")


@functools.partial(
    jax.jit,
    static_argnames=("sweeps", "p1", "num_paths", "adaptive_p2", "interpret"),
)
def sgm_aggregate_pallas_sweeps(
    vol: jnp.ndarray,
    sweeps: tuple = ALL_SWEEPS,
    p1: float = 8.0,
    p2: float = 96.0,
    num_paths: int = 8,
    image: Optional[jnp.ndarray] = None,
    adaptive_p2: bool = False,
    p2_min: float = 24.0,
    interpret: bool = False,
    vol_t: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Partial SGM aggregation over a SUBSET of the 4 sweep directions on an
    (H, D, W) volume. ``sum(sweeps) == sgm_aggregate_pallas_hdw`` — each
    sweep is an independent group of paths (down={0,4,5}, up={1,6,7},
    lr={2}, rl={3} with 8 paths), so disp-mesh shards can each run a
    disjoint sweep subset and ``psum`` the partials (parallel/two_view.py).
    """
    if num_paths not in (4, 8):
        raise ValueError("num_paths must be 4 or 8")
    unknown = set(sweeps) - set(ALL_SWEEPS)
    if unknown:
        raise ValueError(f"unknown sweeps {sorted(unknown)}")
    h, d, w = vol.shape
    dtype = _sum_dtype(vol.dtype)  # p2-map / path-sum dtype

    if adaptive_p2 and image is not None:
        p2_y = _edge_p2(image, 0, p2, p2_min, dtype)  # (H, W)
        p2_x = _edge_p2(image, 1, p2, p2_min, dtype)
    else:
        p2_y = jnp.full((h, w), jnp.asarray(p2, dtype))
        p2_x = p2_y

    diagonals = num_paths == 8
    # NOTE: measured on a v5e chip, separate forward/backward sweeps beat the
    # fused bidirectional kernel (_sweep_hdw_bidir) 21.1 vs 14.2 MP/s
    # end-to-end — the dual block streams double the VMEM working set and
    # starve the pipeliner's double buffering. Kept for smaller D/W shapes.
    # The STACKED-carry variant (one (3D, N) carry for the three same-
    # direction paths) beats three separate carries 4.3x on the vertical
    # sweeps — fatter VPU ops, one dispatch chain per row.
    total = None

    def add(x):
        nonlocal total
        total = x if total is None else total + x

    # Reverse sweeps ACCUMULATE into the forward sweep's volume via
    # input_output_aliases — the pairwise down+up / lr+rl adds cost no
    # extra HBM pass (VERDICT r1 item 2: fuse the final adds into sweeps).
    vert_fwd = None
    if "down" in sweeps:
        vert_fwd = (
            _sweep_hdw_stacked(vol, p2_y, p1, False, interpret)
            if diagonals
            else _sweep_hdw(vol, p2_y, p1, False, False, interpret)
        )
    if "up" in sweeps:
        up = (
            _sweep_hdw_stacked(vol, p2_y, p1, True, interpret, acc=vert_fwd)
            if diagonals
            else _sweep_hdw(vol, p2_y, p1, True, False, interpret, acc=vert_fwd)
        )
        add(up)
    elif vert_fwd is not None:
        add(vert_fwd)

    if "lr" in sweeps or "rl" in sweeps:
        if vol_t is None:  # (W, D, H) twin: prebuilt by the roll-free
            # cost_pallas builder on the fast path, XLA transpose otherwise
            vol_t = transpose_hdw(vol, interpret)
        p2_x_t = jnp.transpose(p2_x, (1, 0))  # (W, H)
        horiz = None
        if "lr" in sweeps:
            horiz = _sweep_hdw(vol_t, p2_x_t, p1, False, False, interpret)
        if "rl" in sweeps:
            horiz = _sweep_hdw(vol_t, p2_x_t, p1, True, False, interpret, acc=horiz)
        if total is None:
            add(transpose_hdw(horiz, interpret))
        else:
            total = transpose_add_hdw(total, horiz, interpret)
    return total


@functools.partial(
    jax.jit, static_argnames=("p1", "num_paths", "adaptive_p2", "interpret")
)
def sgm_aggregate_pallas_hdw(
    vol: jnp.ndarray,
    p1: float = 8.0,
    p2: float = 96.0,
    num_paths: int = 8,
    image: Optional[jnp.ndarray] = None,
    adaptive_p2: bool = False,
    p2_min: float = 24.0,
    interpret: bool = False,
    vol_t: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """8-path SGM over an (H, D, W) cost volume (see
    ``cost_volume.fused_cost_volume(layout="hdw")``). Returns (H, D, W).

    Same semantics as ``sgm_aggregate`` modulo float-sum order; ~2x the
    lane utilization of the (H, W, D) kernels when D < 128. ``vol_t``
    optionally supplies the (W, D, H) twin (identical costs — e.g. from
    ``cost_pallas.fused_cost_volume_pallas_wdh``), skipping the internal
    XLA volume transpose for the horizontal sweeps."""
    return sgm_aggregate_pallas_sweeps(
        vol,
        sweeps=ALL_SWEEPS,
        p1=p1,
        p2=p2,
        num_paths=num_paths,
        image=image,
        adaptive_p2=adaptive_p2,
        p2_min=p2_min,
        interpret=interpret,
        vol_t=vol_t,
    )


@functools.partial(
    jax.jit, static_argnames=("p1", "num_paths", "adaptive_p2", "interpret")
)
def sgm_aggregate_pallas(
    vol: jnp.ndarray,
    p1: float = 8.0,
    p2: float = 96.0,
    num_paths: int = 8,
    image: Optional[jnp.ndarray] = None,
    adaptive_p2: bool = False,
    p2_min: float = 24.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in replacement for ``ops.sgm.sgm_aggregate`` (same semantics,
    Pallas sweeps). ``interpret=True`` runs the kernels in interpreter mode
    for CPU tests."""
    if num_paths not in (4, 8):
        raise ValueError("num_paths must be 4 or 8")
    h, w, d = vol.shape
    dtype = _sum_dtype(vol.dtype)  # p2-map / path-sum dtype

    if adaptive_p2 and image is not None:
        p2_y = _edge_p2(image, 0, p2, p2_min, dtype)  # (H, W)
        p2_x = _edge_p2(image, 1, p2, p2_min, dtype)
    else:
        p2_y = jnp.full((h, w), jnp.asarray(p2, dtype))
        p2_x = p2_y

    diagonals = num_paths == 8
    down = _sweep(vol, p2_y, p1, reverse=False, diagonals=diagonals, interpret=interpret)
    up = _sweep(vol, p2_y, p1, reverse=True, diagonals=diagonals, interpret=interpret)

    vol_t = jnp.swapaxes(vol, 0, 1)  # (W, H, D)
    p2_x_t = jnp.swapaxes(p2_x, 0, 1)
    lr = _sweep(vol_t, p2_x_t, p1, reverse=False, diagonals=False, interpret=interpret)
    rl = _sweep(vol_t, p2_x_t, p1, reverse=True, diagonals=False, interpret=interpret)

    return down + up + jnp.swapaxes(lr + rl, 0, 1)


# --------------------------------------------------------------------- #
# Fused final sweep + extraction: the LAST (up) sweep completes the
# 8-path total row by row — extraction (WTA/subpixel/uniqueness/LR) is
# row-independent, so running it on the in-register total rows skips BOTH
# the total-volume write and the extraction kernel's re-read (2 of the
# pipeline's ~15 HBM volume passes). Outputs are the three (H, W) maps.
# --------------------------------------------------------------------- #


def _sweep_extract_kernel(vol_ref, p2_ref, acc_ref, disp_ref, cost_ref,
                          valid_ref, second_ref, *carries, p1, rows, n_disp,
                          diagonals, subpixel, uniqueness, lr_max_diff):
    """Reverse (bottom-up) vertical sweep with extraction fused in.

    acc_ref holds the sum of every OTHER path group (down-group sweep that
    itself accumulated the transposed horizontal sweeps), so
    ``acc + this_sweep`` is the final aggregated total for the row. The
    extraction math is shared with the standalone kernel
    (``extract_pallas.extract_row_maps``)."""
    from stereovisionarray_tpu.ops.extract_pallas import extract_row_maps

    D = n_disp
    i = pl.program_id(0)
    compute_dtype = _compute_dtype(vol_ref.dtype)
    narrow_dtype = acc_ref.dtype  # the path-sum dtype (int16 for int8 vols)
    narrow = (
        (lambda x: x.astype(narrow_dtype))
        if compute_dtype != narrow_dtype
        else (lambda x: x)
    )

    def emit(r, total):
        a16 = narrow(total)  # extraction barrels run on the narrow dtype
        d_sub, cost, ok, second = extract_row_maps(
            a16, D, subpixel, uniqueness, lr_max_diff
        )
        disp_ref[r] = d_sub
        cost_ref[r] = cost
        valid_ref[r] = ok
        second_ref[r] = second

    for r in range(rows - 1, -1, -1):
        row = vol_ref[r].astype(compute_dtype)  # (D, N)
        p2 = p2_ref[r].astype(compute_dtype)  # (1, N)
        acc = acc_ref[r].astype(compute_dtype)

        if diagonals:
            def step(row=row, p2=p2, r=r, acc=acc):
                carry = carries[0]
                prev = carry[:]  # (3D, N): [axis, diag+1, diag-1]
                shifted = jnp.concatenate(
                    [
                        prev[:D],
                        _shift_lanes(prev[D : 2 * D], +1),
                        _shift_lanes(prev[2 * D :], -1),
                    ],
                    axis=0,
                )
                p1c = _const(p1, shifted)
                s3 = shifted.reshape(3, D, -1)
                big3 = jnp.full_like(s3[:, :1], _big_for(s3.dtype))
                prev_min = jnp.min(s3, axis=1, keepdims=True)
                up = jnp.concatenate([big3, s3[:, :-1]], axis=1)
                dn = jnp.concatenate([s3[:, 1:], big3], axis=1)
                # BIG border sentinel + hoisted +p1 (see _recurrence_dw)
                best = jnp.minimum(
                    jnp.minimum(s3, prev_min + p2[None]),
                    jnp.minimum(up, dn) + p1c,
                )
                l3 = row[None] + (best - prev_min)
                carry[:] = l3.reshape(3 * D, -1)
                emit(r, acc + l3.sum(axis=0))
        else:
            def step(row=row, p2=p2, r=r, acc=acc):
                (c0,) = carries
                l0 = _recurrence_dw(c0[:], row, p1, p2)
                c0[:] = l0
                emit(r, acc + l0)

        if r == rows - 1:
            @pl.when(i == 0)
            def _(row=row, acc=acc, r=r):
                if diagonals:
                    carries[0][:] = jnp.concatenate([row, row, row], axis=0)
                    emit(r, acc + _const(3, row) * row)
                else:
                    carries[0][:] = row
                    emit(r, acc + row)

            @pl.when(i > 0)
            def _():
                step()
        else:
            step()


def _sweep_hdw_extract(vol, p2_map, p1, acc, diagonals, interpret,
                       subpixel, uniqueness, lr_max_diff):
    """Final up-sweep over axis 0 of (S, D, N) vol, extraction fused.

    acc: (S, D, N) sum of the other path groups. Returns (disp, cost,
    valid), each (S, N)."""
    s, d, n = vol.shape
    rows = _block_rows(s)
    nblocks = s // rows
    idx = lambda i: (nblocks - 1 - i, 0, 0)
    carry_shape = (3 * d, n) if diagonals else (d, n)
    # Map outputs are (S, 1, N) with (rows, 1, N) blocks: a 2D (rows, N)
    # block would need rows % 8 == 0, which no divisor of 540 satisfies —
    # the singleton middle axis rides the equal-to-array exemption.
    out3 = lambda dt: (
        pl.BlockSpec((rows, 1, n), idx, memory_space=pltpu.VMEM),
        jax.ShapeDtypeStruct((s, 1, n), dt),
    )
    (dspec, dshape), (cspec, cshape), (vspec, vshape), (sspec, sshape) = (
        out3(jnp.float32), out3(jnp.float32), out3(jnp.bool_),
        out3(jnp.float32),
    )
    disp, cost, valid, second = pl.pallas_call(
        functools.partial(
            _sweep_extract_kernel, p1=float(p1), rows=rows, n_disp=d,
            diagonals=diagonals, subpixel=bool(subpixel),
            uniqueness=float(uniqueness), lr_max_diff=float(lr_max_diff),
        ),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((rows, d, n), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1, n), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, d, n), idx, memory_space=pltpu.VMEM),
        ],
        out_specs=(dspec, cspec, vspec, sspec),
        out_shape=(dshape, cshape, vshape, sshape),
        scratch_shapes=[pltpu.VMEM(carry_shape, _carry_dtype(vol.dtype))],
        # scoped-vmem cap: blocks scale with D; the default 16 MB limit
        # OOMs at D=256 (cascade flat-oracle); v5e has 128 MB
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(vol, p2_map[:, None, :], acc)
    return disp[:, 0], cost[:, 0], valid[:, 0], second[:, 0]


@functools.partial(
    jax.jit,
    static_argnames=(
        "p1", "num_paths", "adaptive_p2", "subpixel", "uniqueness",
        "lr_max_diff", "interpret",
    ),
)
def sgm_extract_fused_hdw(
    vol: jnp.ndarray,
    vol_t: Optional[jnp.ndarray] = None,
    p1: float = 8.0,
    p2: float = 96.0,
    num_paths: int = 8,
    image: Optional[jnp.ndarray] = None,
    adaptive_p2: bool = False,
    p2_min: float = 24.0,
    subpixel: bool = True,
    uniqueness: float = 0.0,
    lr_max_diff: float = 0.0,
    interpret: bool = False,
):
    """8-path SGM + extraction with the minimum number of HBM volume passes.

    vol: (H, D, W) cost volume; vol_t: the SAME costs in (W, D, H) layout
    (from ``cost_pallas.fused_cost_volume_pallas_wdh``, or transposed here
    when None). Horizontal sweeps run first on vol_t; their transposed sum
    seeds the down-group sweep as an aliased accumulator; the final
    up-group sweep emits the extraction maps directly from the in-register
    totals — the aggregated volume itself is never written to HBM.

    Integer volumes produce BIT-IDENTICAL results to
    ``sgm_aggregate_pallas_hdw`` + ``extract_disparity_hdw`` (integer adds
    reassociate exactly); float volumes match modulo sum order.

    Returns an ``extract_pallas.ExtractMaps`` (disparity, cost, valid).
    """
    from stereovisionarray_tpu.ops.extract_pallas import ExtractMaps

    if num_paths not in (4, 8):
        raise ValueError("num_paths must be 4 or 8")
    h, d, w = vol.shape
    dtype = _sum_dtype(vol.dtype)  # p2-map / path-sum dtype
    if vol_t is None:
        vol_t = transpose_hdw(vol, interpret)

    if adaptive_p2 and image is not None:
        p2_y = _edge_p2(image, 0, p2, p2_min, dtype)  # (H, W)
        p2_x = _edge_p2(image, 1, p2, p2_min, dtype)
    else:
        p2_y = jnp.full((h, w), jnp.asarray(p2, dtype))
        p2_x = p2_y
    p2_x_t = jnp.transpose(p2_x, (1, 0))  # (W, H)

    diagonals = num_paths == 8
    horiz = _sweep_hdw(vol_t, p2_x_t, p1, False, False, interpret)
    horiz = _sweep_hdw(vol_t, p2_x_t, p1, True, False, interpret, acc=horiz)
    horiz_t = transpose_hdw(horiz, interpret)  # (H, D, W)
    down = (
        _sweep_hdw_stacked(vol, p2_y, p1, False, interpret, acc=horiz_t)
        if diagonals
        else _sweep_hdw(vol, p2_y, p1, False, False, interpret, acc=horiz_t)
    )
    disp, cost, valid, second = _sweep_hdw_extract(
        vol, p2_y, p1, down, diagonals, interpret, subpixel, uniqueness,
        lr_max_diff,
    )
    return ExtractMaps(disparity=disp, cost=cost, valid=valid, second=second)


# --------------------------------------------------------------------- #
# Fused final RL sweep + extraction in the (W, D, H) layout: the reverse
# horizontal sweep completes the 8-path total column by column, and in
# this layout BOTH extraction views are cheap:
#   - the left WTA/subpixel/uniqueness read the completed (D, H) column
#     directly (D on sublanes, exactly like the (H, D, W) extraction);
#   - the RIGHT-view WTA — ar[d, x'] = total[d, x' + d], a lane barrel
#     costing log2(D) full-slab rolls in the row-major kernel — becomes a
#     STREAMING anti-diagonal reduction: pending right-column x' sits at
#     sublane j = x - x' of a (D, H) buffer set; every sweep step merges
#     the new total column elementwise (position j receives its d = j
#     candidate) and ages the buffers by ONE sublane shift. Lane rolls
#     (the expensive op class on this chip) are eliminated entirely from
#     extraction; the completed right column falls out at j = 0.
# Only the map-level LR gather d_R(x - d_L(x)) remains outside (it needs
# future columns) — extract_pallas.lr_gather_maps runs it over (H, W)
# maps, ~1000x less data than a volume pass.
# --------------------------------------------------------------------- #


def _rl_extract_kernel(vol_ref, p2_ref, acc_ref, displ_ref, cost_ref,
                       validu_ref, dispr_ref, secondl_ref, carry, pbest,
                       bidx, prev, cmb, cpb, updl, *, p1, rows, n_disp,
                       subpixel, uniqueness):
    """Reverse (right-to-left) horizontal sweep over a (W, D, H) volume
    with both extraction views fused in.

    acc_ref: sum of every other path group (vertical sweeps, transposed,
    accumulated through the forward horizontal sweep), so acc + this sweep
    is the final aggregated total for the column. Emits per column x:
    left subpixel disparity / winning cost / uniqueness validity, and the
    RIGHT-view subpixel disparity d_R(x) — bit-identical to running
    ``extract_pallas.extract_row_maps`` on the assembled total volume
    (same packed-WTA tie-breaks, same BIG fills for out-of-image
    right-view candidates, see the parity test in tests/test_sgm_pallas.py).

    Streaming right-WTA state (all (D, H) VMEM scratch, sublane j =
    pending right column x - j; candidates arrive in DESCENDING d = j):
      pbest  packed (cost << lg) | d running min (int volumes) or cost
             running min (float volumes, bidx carries the argmin)
      prev   last merged candidate column -> the d+1 neighbour of a
             winner at d (set at the winner's merge)
      cmb    the d-1 neighbour (the candidate one step AFTER the winner:
             resolved via the updl flag)
      cpb    the d+1 neighbour of the running winner
      updl   1 where the previous step's merge updated the winner
    """
    from stereovisionarray_tpu.ops.extract_pallas import (
        _big_for,
        _subpixel,
        extract_row_maps,
    )

    D = n_disp
    i = pl.program_id(0)
    int_path = jnp.issubdtype(vol_ref.dtype, jnp.integer)
    compute_dtype = _compute_dtype(vol_ref.dtype)
    narrow_dtype = acc_ref.dtype  # path-sum dtype (int16 for int8 volumes)
    narrow = (
        (lambda x: x.astype(narrow_dtype))
        if compute_dtype != narrow_dtype
        else (lambda x: x)
    )
    big = _big_for(narrow_dtype)
    lg = (D - 1).bit_length()

    h = vol_ref.shape[-1]
    d_iota = jax.lax.broadcasted_iota(jnp.int32, (D, h), 0)

    @pl.when(i == 0)
    def _init():
        if int_path:
            pbest[:] = jnp.full((D, h), (big << lg) | D, jnp.int32)
        else:
            pbest[:] = jnp.full((D, h), big, compute_dtype)
            bidx[:] = jnp.full((D, h), D, jnp.int32)
        prev[:] = jnp.full((D, h), big, compute_dtype)
        cmb[:] = jnp.full((D, h), big, compute_dtype)
        cpb[:] = jnp.full((D, h), big, compute_dtype)
        updl[:] = jnp.zeros((D, h), jnp.int32)

    def shift_down(buf, fill):
        # pending columns age one position per step: new[j] = old[j+1]
        return jnp.concatenate(
            [buf[1:], jnp.full_like(buf[:1], fill)], axis=0
        )

    def emit(r, total):
        a16 = narrow(total)
        c = a16.astype(compute_dtype)  # candidate column, stored-int16 bits

        # left view: same code as the standalone volume-extraction kernel
        d_sub, cost, ok, secondl = extract_row_maps(
            a16, D, subpixel, uniqueness, 0.0
        )

        # right view: age buffers, resolve pending cm, merge candidates
        pv = shift_down(prev[:], big)
        cm = shift_down(cmb[:], big)
        cp = shift_down(cpb[:], big)
        ul = shift_down(updl[:], 0)
        cm = jnp.where(ul == 1, c, cm)
        if int_path:
            pb = shift_down(pbest[:], (big << lg) | D)
            pc = (c << lg) | d_iota
            upd = pc < pb
            pb = jnp.minimum(pb, pc)
            pbest[:] = pb
            cmin_r = pb[:1] >> lg
            dint_r = pb[:1] & ((1 << lg) - 1)
        else:
            pb = shift_down(pbest[:], big)
            bi = shift_down(bidx[:], D)
            # descending-d arrival: <= makes later (smaller d) candidates
            # win ties — the standalone's smallest-d tie-break
            upd = c <= pb
            pb = jnp.minimum(pb, c)
            bi = jnp.where(upd, d_iota, bi)
            pbest[:] = pb
            bidx[:] = bi
            cmin_r = pb[:1]
            dint_r = bi[:1]
        cp = jnp.where(upd, pv, cp)
        prev[:] = c
        cmb[:] = cm
        cpb[:] = cp
        updl[:] = upd.astype(jnp.int32)

        d_c = jnp.clip(dint_r, 1, D - 2)
        if subpixel:
            dr = _subpixel(dint_r, d_c, cm[:1], cmin_r, cp[:1], D,
                           compute_dtype)
        else:
            dr = dint_r.astype(jnp.float32)

        displ_ref[r] = d_sub
        cost_ref[r] = cost
        validu_ref[r] = ok
        dispr_ref[r] = dr
        secondl_ref[r] = secondl

    for r in range(rows - 1, -1, -1):
        row = vol_ref[r].astype(compute_dtype)  # (D, H)
        p2 = p2_ref[r].astype(compute_dtype)  # (1, H)
        acc = acc_ref[r].astype(compute_dtype)

        if r == rows - 1:
            @pl.when(i == 0)
            def _(row=row, acc=acc, r=r):
                carry[:] = row
                emit(r, acc + row)

            @pl.when(i > 0)
            def _(row=row, p2=p2, acc=acc, r=r):
                l0 = _recurrence_dw(carry[:], row, p1, p2)
                carry[:] = l0
                emit(r, acc + l0)
        else:
            l0 = _recurrence_dw(carry[:], row, p1, p2)
            carry[:] = l0
            emit(r, acc + l0)


def _rl_extract_wdh(vol_t, p2_map_t, p1, acc, interpret, subpixel,
                    uniqueness):
    """Final reverse horizontal sweep over (W, D, H) vol_t with fused
    two-view extraction. acc: (W, D, H) sum of the other path groups.
    Returns (disp_l, cost, valid_u, disp_r), each (W, H) (column-major —
    the orchestrator transposes the small maps)."""
    w, d, h = vol_t.shape
    rows = _block_rows(w)
    nblocks = w // rows
    idx = lambda i: (nblocks - 1 - i, 0, 0)
    cdt = _carry_dtype(vol_t.dtype)
    int_path = jnp.issubdtype(vol_t.dtype, jnp.integer)
    out3 = lambda dt: (
        pl.BlockSpec((rows, 1, h), idx, memory_space=pltpu.VMEM),
        jax.ShapeDtypeStruct((w, 1, h), dt),
    )
    specs, shapes = zip(out3(jnp.float32), out3(jnp.float32),
                        out3(jnp.bool_), out3(jnp.float32),
                        out3(jnp.float32))
    displ, cost, validu, dispr, secondl = pl.pallas_call(
        functools.partial(
            _rl_extract_kernel, p1=float(p1), rows=rows, n_disp=d,
            subpixel=bool(subpixel), uniqueness=float(uniqueness),
        ),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((rows, d, h), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1, h), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, d, h), idx, memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(specs),
        out_shape=tuple(shapes),
        scratch_shapes=[
            pltpu.VMEM((d, h), cdt),  # carry
            pltpu.VMEM((d, h), jnp.int32 if int_path else cdt),  # pbest
            # bidx carries the argmin on the FLOAT path only; the integer
            # path packs it into pbest — allocate one min tile, not (d, h)
            pltpu.VMEM(
                (8, 128) if int_path else (d, h), jnp.int32
            ),  # bidx
            pltpu.VMEM((d, h), cdt),  # prev
            pltpu.VMEM((d, h), cdt),  # cmb
            pltpu.VMEM((d, h), cdt),  # cpb
            pltpu.VMEM((d, h), jnp.int32),  # updl
        ],
        # scoped-vmem cap: blocks scale with D; the default 16 MB limit
        # OOMs at D=256 (cascade flat-oracle); v5e has 128 MB
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(vol_t, p2_map_t[:, None, :], acc)
    return displ[:, 0], cost[:, 0], validu[:, 0], dispr[:, 0], secondl[:, 0]


@functools.partial(
    jax.jit,
    static_argnames=(
        "p1", "num_paths", "adaptive_p2", "subpixel", "uniqueness",
        "lr_max_diff", "interpret",
    ),
)
def sgm_extract_fused_wdh(
    vol: jnp.ndarray,
    vol_t: Optional[jnp.ndarray] = None,
    p1: float = 8.0,
    p2: float = 96.0,
    num_paths: int = 8,
    image: Optional[jnp.ndarray] = None,
    adaptive_p2: bool = False,
    p2_min: float = 24.0,
    subpixel: bool = True,
    uniqueness: float = 0.0,
    lr_max_diff: float = 0.0,
    interpret: bool = False,
):
    """8-path SGM + two-view extraction with the horizontal sweeps LAST.

    vol: (H, D, W) costs (vertical sweeps); vol_t: the SAME costs in
    (W, D, H) layout (``cost_pallas.fused_cost_volume_pallas_wdh``; XLA
    transpose when None). The vertical group runs first, its transposed
    sum seeds the forward horizontal sweep as an aliased accumulator, and
    the reverse horizontal sweep emits all extraction maps directly — the
    aggregated volume never touches HBM, and the right-view WTA is a
    streaming sublane reduction instead of lane barrels (see
    ``_rl_extract_kernel``). Bit-identical to ``sgm_aggregate_pallas_hdw``
    + ``extract_disparity_hdw`` for integer volumes.

    Returns an ``extract_pallas.ExtractMaps`` (disparity, cost, valid),
    each (H, W).
    """
    from stereovisionarray_tpu.ops.extract_pallas import (
        _BIG,
        ExtractMaps,
        lr_gather_maps,
    )

    if num_paths not in (4, 8):
        raise ValueError("num_paths must be 4 or 8")
    h, d, w = vol.shape
    dtype = _sum_dtype(vol.dtype)  # p2-map / path-sum dtype
    if vol_t is None:
        vol_t = transpose_hdw(vol, interpret)

    if adaptive_p2 and image is not None:
        p2_y = _edge_p2(image, 0, p2, p2_min, dtype)  # (H, W)
        p2_x = _edge_p2(image, 1, p2, p2_min, dtype)
    else:
        p2_y = jnp.full((h, w), jnp.asarray(p2, dtype))
        p2_x = p2_y
    p2_x_t = jnp.transpose(p2_x, (1, 0))  # (W, H)

    diagonals = num_paths == 8
    vert = (
        _sweep_hdw_stacked(vol, p2_y, p1, False, interpret)
        if diagonals
        else _sweep_hdw(vol, p2_y, p1, False, False, interpret)
    )
    vert = (
        _sweep_hdw_stacked(vol, p2_y, p1, True, interpret, acc=vert)
        if diagonals
        else _sweep_hdw(vol, p2_y, p1, True, False, interpret, acc=vert)
    )
    vert_t = transpose_hdw(vert, interpret)  # (W, D, H)
    fwd = _sweep_hdw(vol_t, p2_x_t, p1, False, False, interpret, acc=vert_t)
    displ, cost, validu, dispr, secondl = _rl_extract_wdh(
        vol_t, p2_x_t, p1, fwd, interpret, subpixel, uniqueness,
    )
    disp_l = jnp.transpose(displ)  # (H, W)
    cost = jnp.transpose(cost)
    valid = jnp.transpose(validu)
    second = jnp.transpose(secondl)
    if lr_max_diff > 0.0:
        at = lr_gather_maps(disp_l, jnp.transpose(dispr), d, interpret)
        valid = valid & (jnp.abs(disp_l - at) <= lr_max_diff) & (at < _BIG)
    return ExtractMaps(disparity=disp_l, cost=cost, valid=valid, second=second)


# --------------------------------------------------------------------- #
# Experimental: stacked-carry vertical sweep — all 3 diagonal-group paths
# in ONE (3*D, N) carry so the recurrence's mins/adds run on 3x-fatter
# registers (fewer Mosaic op dispatches per row).
# --------------------------------------------------------------------- #


def _sweep_kernel_hdw_stacked(vol_ref, p2_ref, *rest, p1, rows,
                              reverse, n_disp, accumulate, has_init=False,
                              emit_final=False):
    refs = list(rest)
    init_ref = refs.pop(0) if has_init else None
    acc_ref = refs.pop(0) if accumulate else None
    final_ref = None
    if emit_final:
        out_ref, final_ref, carry = refs
    else:
        out_ref, carry = refs
    D = n_disp
    i = pl.program_id(0)
    compute_dtype = _compute_dtype(vol_ref.dtype)
    store = (
        (lambda x: x.astype(out_ref.dtype))
        if compute_dtype != out_ref.dtype
        else (lambda x: x)
    )
    order = range(rows - 1, -1, -1) if reverse else range(rows)
    first_r = order[0] if rows else 0
    for r in order:
        row = vol_ref[r].astype(compute_dtype)  # (D, N)
        p2 = p2_ref[r].astype(compute_dtype)  # (1, N)
        acc = acc_ref[r].astype(compute_dtype) if accumulate else None

        def step(row=row, p2=p2, r=r, acc=acc):
            prev = carry[:]  # (3D, N): [axis, diag+1, diag-1]
            # per-path lane shifts on the diagonal segments
            shifted = jnp.concatenate(
                [
                    prev[:D],
                    _shift_lanes(prev[D : 2 * D], +1),
                    _shift_lanes(prev[2 * D :], -1),
                ],
                axis=0,
            )
            p1c = _const(p1, shifted)
            s3 = shifted.reshape(3, D, -1)
            big3 = jnp.full_like(s3[:, :1], _big_for(s3.dtype))
            prev_min = jnp.min(s3, axis=1, keepdims=True)  # (3, 1, N)
            up = jnp.concatenate([big3, s3[:, :-1]], axis=1)
            dn = jnp.concatenate([s3[:, 1:], big3], axis=1)
            # BIG border sentinel + hoisted +p1 (see _recurrence_dw)
            best = jnp.minimum(
                jnp.minimum(s3, prev_min + p2[None]),
                jnp.minimum(up, dn) + p1c,
            )
            l3 = row[None] + (best - prev_min)  # (3, D, N)
            flat = l3.reshape(3 * D, -1)
            carry[:] = flat
            total = l3.sum(axis=0)
            out_ref[r] = store(total if acc is None else acc + total)

        if has_init:
            # seeded sweep (exact tile relay): the incoming (3D, N) front
            # replaces the fresh start — EVERY row, including the first,
            # is a recurrence step. A BIG-filled incoming front reproduces
            # fresh-start semantics exactly: the recurrence normalizes a
            # uniform carry to cost + 0 (see parallel/two_view._relay_scan).
            if r == first_r:
                @pl.when(i == 0)
                def _():
                    carry[:] = init_ref[...].astype(carry.dtype)
            step()
        elif r == first_r:
            @pl.when(i == 0)
            def _(row=row, acc=acc):
                carry[:] = jnp.concatenate([row, row, row], axis=0)
                first = _const(3, row) * row
                out_ref[r] = store(first if acc is None else acc + first)

            @pl.when(i > 0)
            def _():
                step()
        else:
            step()

    if emit_final:
        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            final_ref[...] = carry[:]


def _sweep_hdw_stacked(vol, p2_map, p1, reverse: bool, interpret: bool,
                       acc=None, init_carry=None, emit_final=False):
    """Stacked 3-path vertical sweep. init_carry: optional (3D, N) incoming
    wavefront (compute dtype) that seeds the scan instead of the fresh
    start — the exact-tile-relay hook (parallel/two_view.py). With
    emit_final=True also returns the outgoing (3D, N) front."""
    s, d, n = vol.shape
    rows = _block_rows(s)
    nblocks = s // rows
    idx = (lambda i: (nblocks - 1 - i, 0, 0)) if reverse else (lambda i: (i, 0, 0))
    operands = [vol, p2_map[:, None, :]]
    in_specs = [
        pl.BlockSpec((rows, d, n), idx, memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, 1, n), idx, memory_space=pltpu.VMEM),
    ]
    cdt = _carry_dtype(vol.dtype)
    if init_carry is not None:
        operands.append(init_carry.astype(cdt))
        in_specs.append(
            pl.BlockSpec((3 * d, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
    aliases = {}
    if acc is not None:
        operands.append(acc)
        in_specs.append(pl.BlockSpec((rows, d, n), idx, memory_space=pltpu.VMEM))
        aliases = {len(operands) - 1: 0}
    out_dtype = acc.dtype if acc is not None else _sum_dtype(vol.dtype)
    out_specs = pl.BlockSpec((rows, d, n), idx, memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct(vol.shape, out_dtype)
    if emit_final:
        out_specs = (out_specs, pl.BlockSpec((3 * d, n), lambda i: (0, 0),
                                             memory_space=pltpu.VMEM))
        out_shape = (out_shape, jax.ShapeDtypeStruct((3 * d, n), cdt))
    result = pl.pallas_call(
        functools.partial(
            _sweep_kernel_hdw_stacked, p1=float(p1), rows=rows, reverse=reverse,
            n_disp=d, accumulate=acc is not None,
            has_init=init_carry is not None, emit_final=emit_final,
        ),
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((3 * d, n), cdt)],
        input_output_aliases=aliases,
        # scoped-vmem cap: blocks scale with D; the default 16 MB limit
        # OOMs at D=256 (cascade flat-oracle); v5e has 128 MB
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(*operands)
    return result
