"""Bundle adjustment: Gauss-Newton with Schur-complement reduction, solved
matrix-free by preconditioned conjugate gradients.

Replaces the reference's hard-coded pose grid
(``/root/reference/src/CameraStereoVision.cpp:33-39``) with estimated poses.

TPU-native structure (SURVEY.md §7 step 8, "hard parts"):
 - the sparse landmark-camera normal equations are never materialized —
   per-observation 2x6 / 2x3 Jacobian blocks are contracted on the fly
   (einsum batched over all M observations), camera/point blocks are built
   with ``segment_sum``;
 - the reduced camera system S δc = b is solved by CG where each
   matvec S x = (U + λ) x − W V⁻¹ Wᵀ x is two segment-sums and a batched
   3x3 solve — exactly the form that distributes over an observation-sharded
   mesh with one ``psum`` per matvec (``parallel/ba.py``, config 5);
 - fixed iteration counts everywhere (GN outer loop via ``lax.scan``, CG
   inner loop via ``lax.fori_loop``) — no data-dependent control flow, one
   compiled program.

Gauge: camera 0 is frozen; the global scale is fixed by renormalizing the
camera-0 -> camera-1 baseline to its initial length after every update
(scale is unobservable from reprojections alone).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from stereovisionarray_tpu.geometry.camera import CameraArray
from stereovisionarray_tpu.geometry.lie import _hat, so3_exp

_HI = jax.lax.Precision.HIGHEST


class BAProblem(NamedTuple):
    """Fixed-shape observation list (pad with valid=False)."""

    cam_idx: jnp.ndarray  # (M,) int32
    pt_idx: jnp.ndarray  # (M,) int32
    uv: jnp.ndarray  # (M, 2) float32 measurements
    valid: jnp.ndarray  # (M,) bool


class BAState(NamedTuple):
    cameras: CameraArray
    points: jnp.ndarray  # (P, 3)
    cost: jnp.ndarray  # (iters + 1,) robust mean cost per iteration


def _robust_weight(norm: jnp.ndarray, scale: float, kernel: str) -> jnp.ndarray:
    """IRLS weight ρ'(r)/r for the chosen robust kernel.

    huber: bounded influence; cauchy: quadratically decaying; tukey: hard
    redescending cut at c = max(scale, 4.685 * MAD) — outliers get weight 0
    once the bulk has tightened (the MAD floor keeps early iterations, when
    all residuals are large, from rejecting everything)."""
    if kernel == "huber":
        return jnp.where(norm <= scale, 1.0, scale / jnp.maximum(norm, 1e-9))
    if kernel == "cauchy":
        return 1.0 / (1.0 + (norm / scale) ** 2)
    if kernel == "tukey":
        mad = jnp.median(jnp.abs(norm - jnp.median(norm)))
        c = jnp.maximum(jnp.asarray(scale, norm.dtype), 4.685 * 1.4826 * mad)
        u = jnp.clip(norm / c, 0.0, 1.0)
        return (1.0 - u * u) ** 2
    raise ValueError(f"unknown robust kernel {kernel!r}")


def _residuals_and_blocks(
    R, t, X, fx, fy, problem: BAProblem, huber: float, kernel: str = "huber"
):
    """Per-observation residuals, robust weights and Jacobian blocks.

    Returns r (M,2), w (M,), Jc (M,2,6), Jp (M,2,3)."""
    ci, pi = problem.cam_idx, problem.pt_idx
    x_cam = (
        jnp.einsum("mij,mj->mi", R[ci], X[pi], precision=_HI) + t[ci]
    )  # (M, 3)
    z = x_cam[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    inv_z = 1.0 / z_safe
    fxm = fx[ci]
    fym = fy[ci]
    u = fxm * x_cam[..., 0] * inv_z
    v = fym * x_cam[..., 1] * inv_z
    # measurement relative to principal point is folded into uv by caller
    r = jnp.stack([u, v], axis=-1) - problem.uv  # (M, 2)

    # projection Jacobian d(u,v)/d(x_cam): (M, 2, 3)
    zero = jnp.zeros_like(z)
    J_proj = jnp.stack(
        [
            jnp.stack([fxm * inv_z, zero, -fxm * x_cam[..., 0] * inv_z * inv_z], -1),
            jnp.stack([zero, fym * inv_z, -fym * x_cam[..., 1] * inv_z * inv_z], -1),
        ],
        axis=-2,
    )
    # left-perturbation: dx_cam/dω = -[x_cam]x, dx_cam/dv = I, dx_cam/dX = R
    J_cam = jnp.concatenate(
        [
            -jnp.einsum("mij,mjk->mik", J_proj, _hat(x_cam), precision=_HI),
            J_proj,
        ],
        axis=-1,
    )  # (M, 2, 6) for (ω, v)
    J_pt = jnp.einsum("mij,mjk->mik", J_proj, R[ci], precision=_HI)  # (M, 2, 3)

    # robust weight per observation; behind-camera rejected
    norm = jnp.linalg.norm(r, axis=-1)
    w_rob = _robust_weight(norm, huber, kernel)
    w = w_rob * problem.valid.astype(r.dtype) * (z > 1e-4).astype(r.dtype)
    return r, w, J_cam, J_pt


def _ba_iteration(
    R, t, X, fx, fy, problem: BAProblem, n_cams: int, n_pts: int,
    damping: float, huber: float, cg_iters: int, kernel: str,
):
    """One damped Gauss-Newton step. Returns (dc (Nc,6), dp (P,3), cost)."""
    r, w, Jc, Jp = _residuals_and_blocks(R, t, X, fx, fy, problem, huber, kernel)
    ci, pi = problem.cam_idx, problem.pt_idx

    wJc = Jc * w[:, None, None]
    wJp = Jp * w[:, None, None]
    U = jax.ops.segment_sum(
        jnp.einsum("mri,mrj->mij", Jc, wJc, precision=_HI), ci, num_segments=n_cams
    )  # (Nc, 6, 6)
    V = jax.ops.segment_sum(
        jnp.einsum("mri,mrj->mij", Jp, wJp, precision=_HI), pi, num_segments=n_pts
    )  # (P, 3, 3)
    W_m = jnp.einsum("mri,mrj->mij", wJc, Jp, precision=_HI)  # (M, 6, 3)
    b_c = -jax.ops.segment_sum(
        jnp.einsum("mri,mr->mi", wJc, r, precision=_HI), ci, num_segments=n_cams
    )
    b_p = -jax.ops.segment_sum(
        jnp.einsum("mri,mr->mi", wJp, r, precision=_HI), pi, num_segments=n_pts
    )

    lam = jnp.asarray(damping, R.dtype)
    U = U + lam * jnp.eye(6, dtype=R.dtype)[None]
    V = V + lam * jnp.eye(3, dtype=R.dtype)[None]
    V_inv = jnp.linalg.inv(V)  # (P, 3, 3) — tiny batched inverses

    # gauge: freeze camera 0 (identity row/col in S, zero rhs)
    fixed = jnp.arange(n_cams) == 0  # (Nc,)

    def mask_c(x):  # zero the fixed camera's 6-vector
        return jnp.where(fixed[:, None], 0.0, x)

    b_red = mask_c(
        b_c
        - jax.ops.segment_sum(
            jnp.einsum("mij,mj->mi", W_m, jnp.einsum(
                "pij,pj->pi", V_inv, b_p, precision=_HI)[pi], precision=_HI),
            ci,
            num_segments=n_cams,
        )
    )

    def schur_matvec(x):  # x: (Nc, 6)
        x = mask_c(x)
        Ux = jnp.einsum("cij,cj->ci", U, x, precision=_HI)
        y = jax.ops.segment_sum(
            jnp.einsum("mij,mi->mj", W_m, x[ci], precision=_HI),
            pi,
            num_segments=n_pts,
        )  # (P, 3) = Wᵀ x
        z2 = jnp.einsum("pij,pj->pi", V_inv, y, precision=_HI)
        EVWx = jax.ops.segment_sum(
            jnp.einsum("mij,mj->mi", W_m, z2[pi], precision=_HI),
            ci,
            num_segments=n_cams,
        )
        return mask_c(Ux - EVWx)

    # block-Jacobi preconditioner
    U_inv = jnp.linalg.inv(U)

    def precond(x):
        return mask_c(jnp.einsum("cij,cj->ci", U_inv, x, precision=_HI))

    # preconditioned CG, fixed iterations
    x0 = jnp.zeros_like(b_red)
    r0 = b_red
    z0 = precond(r0)
    p0 = z0

    def cg_body(_, carry):
        x, rr, z, p = carry
        Ap = schur_matvec(p)
        rz = jnp.sum(rr * z)
        denom = jnp.sum(p * Ap)
        alpha = rz / jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
        x = x + alpha * p
        r_new = rr - alpha * Ap
        z_new = precond(r_new)
        beta = jnp.sum(r_new * z_new) / jnp.where(jnp.abs(rz) < 1e-20, 1e-20, rz)
        return x, r_new, z_new, z_new + beta * p

    dc, *_ = jax.lax.fori_loop(0, cg_iters, cg_body, (x0, r0, z0, p0))

    # back-substitute points: dp = V⁻¹ (b_p − Wᵀ dc)
    Wt_dc = jax.ops.segment_sum(
        jnp.einsum("mij,mi->mj", W_m, dc[ci], precision=_HI),
        pi,
        num_segments=n_pts,
    )
    dp = jnp.einsum("pij,pj->pi", V_inv, b_p - Wt_dc, precision=_HI)

    cost = jnp.sum(w * jnp.sum(r * r, axis=-1)) / jnp.maximum(jnp.sum(w), 1e-9)
    return dc, dp, cost


@functools.partial(
    jax.jit, static_argnames=("iterations", "cg_iters", "fix_scale", "kernel")
)
def bundle_adjust(
    cameras: CameraArray,
    points: jnp.ndarray,
    problem: BAProblem,
    iterations: int = 20,
    damping: float = 1e-3,
    huber: float = 2.0,
    cg_iters: int = 30,
    fix_scale: bool = True,
    kernel: str = "huber",
) -> BAState:
    """Run ``iterations`` damped-GN steps; returns refined cameras/points.

    ``problem.uv`` must be principal-point-centred pixel measurements
    (u - cx, v - cy) — intrinsics are known and fixed (array-calibration
    refines extrinsics + structure, matching the reference's setting of a
    known camera model with unknown-but-rigid placement).
    """
    n_cams = len(cameras)
    n_pts = points.shape[0]
    R0, t0 = cameras.R, cameras.t
    fx, fy = cameras.fx, cameras.fy
    base_len = jnp.linalg.norm(cameras.centers[1] - cameras.centers[0]) + 1e-12

    def step(carry, _):
        R, t, X = carry
        dc, dp, cost = _ba_iteration(
            R, t, X, fx, fy, problem, n_cams, n_pts, damping, huber, cg_iters,
            kernel,
        )
        dR = so3_exp(dc[:, :3].reshape(-1, 3))  # (Nc, 3, 3) batched exp
        R_new = jnp.einsum("cij,cjk->cik", dR, R, precision=_HI)
        t_new = jnp.einsum("cij,cj->ci", dR, t, precision=_HI) + dc[:, 3:]
        X_new = X + dp
        if fix_scale:
            # renormalize the gauge baseline |C1 - C0| about C0
            C = -jnp.einsum("cji,cj->ci", R_new, t_new, precision=_HI)
            s = base_len / (jnp.linalg.norm(C[1] - C[0]) + 1e-12)
            C0 = C[0]
            C_scaled = C0 + s * (C - C0)
            X_new = C0 + s * (X_new - C0)
            t_new = -jnp.einsum("cij,cj->ci", R_new, C_scaled, precision=_HI)
        return (R_new, t_new, X_new), cost

    (R_f, t_f, X_f), costs = jax.lax.scan(
        step, (R0, t0, points.astype(R0.dtype)), None, length=iterations
    )
    # final cost for reporting
    r, w, _, _ = _residuals_and_blocks(R_f, t_f, X_f, fx, fy, problem, huber, kernel)
    final_cost = jnp.sum(w * jnp.sum(r * r, axis=-1)) / jnp.maximum(jnp.sum(w), 1e-9)
    cams_out = CameraArray(
        fx=cameras.fx, fy=cameras.fy, cx=cameras.cx, cy=cameras.cy, R=R_f, t=t_f
    )
    return BAState(
        cameras=cams_out,
        points=X_f,
        cost=jnp.concatenate([costs, final_cost[None]]),
    )
