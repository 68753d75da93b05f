"""Sparse Levenberg-Marquardt bundle adjustment with Schur complement.

Replaces the reference's dense finite-difference `scipy.optimize.
least_squares` BA (sfm.py:104-157; ~30s/frame per sfm.py:378) with the
TPU-native design from SURVEY.md §2.2/§7:

- Parameterization per the reference notebook's sparse prototype (cameras
  as 6-dof axis-angle + translation, points 3-dof, observations FIXED) —
  not sfm.py's defective pack that also optimizes the 2D observations and
  K (sfm.py:141-143).
- Analytic per-observation Jacobians via vmapped forward-mode AD: A_o
  (2x6 camera block), B_o (2x3 point block).
- Gauss-Newton normal equations assembled with `segment_sum` over the
  observation table: U_c = sum A^T A, V_p = sum B^T B, W_o = A^T B.
- Schur complement of the point blocks applied MATRIX-FREE: the reduced
  camera system S = U - W V^-1 W^T is never materialized; S @ x costs two
  segment-sums over observations. Solved by block-Jacobi-preconditioned
  conjugate gradients. This is O(obs) per CG step, fully vectorized, and
  shards across devices by splitting the observation table (each device
  computes partial segment-sums; a psum yields the global products — see
  parallel/distributed_ba.py).
- Classic LM accept/reject loop with multiplicative damping, as a
  `lax.while_loop` (jit-compatible, fixed max iterations).

Gauge: camera 0 is frozen (its Jacobian blocks are zeroed); the remaining
scale gauge freedom is controlled by the LM damping.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sfm_mvs_tpu.models.map_store import MapState
from sfm_mvs_tpu.ops import lie

# ---------------------------------------------------------------------------
# Problem container
# ---------------------------------------------------------------------------


class BAProblem(NamedTuple):
    """Fixed-capacity bundle-adjustment problem (a view over MapState)."""

    cam_params: jnp.ndarray  # (C, 6) [rvec | tvec]
    points: jnp.ndarray  # (P, 3)
    cam_valid: jnp.ndarray  # (C,)
    point_valid: jnp.ndarray  # (P,)
    obs_cam: jnp.ndarray  # (O,) int32
    obs_point: jnp.ndarray  # (O,) int32
    obs_uv: jnp.ndarray  # (O, 2)
    obs_valid: jnp.ndarray  # (O,)
    K: jnp.ndarray  # (3, 3)
    frozen: jnp.ndarray  # (C,) bool — cameras excluded from optimization


class BAStats(NamedTuple):
    initial_cost: jnp.ndarray  # () mean squared pixel residual
    final_cost: jnp.ndarray
    iterations: jnp.ndarray  # () LM iterations executed
    accepted: jnp.ndarray  # () accepted steps


def problem_from_map(state: MapState, frozen_first: int = 1) -> BAProblem:
    """Build a BAProblem from the map (jit-safe, pure slicing/conversion)."""
    rvec, tvec = lie.matrix_to_rt(state.poses)
    cam_params = jnp.concatenate([rvec, tvec], axis=-1)
    cam_idx = jnp.arange(state.poses.shape[0])
    return BAProblem(
        cam_params=cam_params,
        points=state.points,
        cam_valid=state.cam_valid,
        point_valid=state.point_valid,
        obs_cam=state.obs_cam,
        obs_point=state.obs_point,
        obs_uv=state.obs_uv,
        obs_valid=state.obs_valid,
        K=state.K,
        frozen=cam_idx < frozen_first,
    )


def write_back_to_map(state: MapState, prob: BAProblem) -> MapState:
    """Write optimized cameras/points back into the map."""
    poses = lie.rt_to_matrix(prob.cam_params[:, :3], prob.cam_params[:, 3:])
    return state._replace(poses=poses, points=prob.points)


# ---------------------------------------------------------------------------
# Residuals + Jacobians
# ---------------------------------------------------------------------------


def _residual_one(cam6: jnp.ndarray, X: jnp.ndarray, uv: jnp.ndarray, K: jnp.ndarray):
    """Reprojection residual of one observation. (6,), (3,), (2,) -> (2,)."""
    R = lie.so3_exp(cam6[:3])
    Xc = R @ X + cam6[3:]
    z = jnp.where(jnp.abs(Xc[2]) < 1e-9, 1e-9, Xc[2])
    u = (K[0, 0] * Xc[0] + K[0, 1] * Xc[1]) / z + K[0, 2]
    v = K[1, 1] * Xc[1] / z + K[1, 2]
    return jnp.stack([u, v]) - uv


_res_and_jac = jax.vmap(
    lambda c, X, uv, K: (
        _residual_one(c, X, uv, K),
        jax.jacfwd(_residual_one, argnums=(0, 1))(c, X, uv, K),
    ),
    in_axes=(0, 0, 0, None),
)


def _gather_residuals(prob: BAProblem):
    """Per-obs residuals r (O,2), Jacobians A (O,2,6), B (O,2,3), weight (O,)."""
    C = prob.cam_params.shape[0]
    P = prob.points.shape[0]
    oc = jnp.clip(prob.obs_cam, 0, C - 1)
    op = jnp.clip(prob.obs_point, 0, P - 1)
    cams = prob.cam_params[oc]
    pts = prob.points[op]
    w = (
        prob.obs_valid
        & prob.cam_valid[oc]
        & prob.point_valid[op]
    ).astype(prob.points.dtype)
    r, (A, B) = _res_and_jac(cams, pts, prob.obs_uv, prob.K)
    r = r * w[:, None]
    A = A * w[:, None, None]
    # Frozen cameras contribute no camera-block Jacobian.
    A = A * (~prob.frozen[oc]).astype(A.dtype)[:, None, None]
    B = B * w[:, None, None]
    return r, A, B, w, oc, op


def _cost(prob: BAProblem, axis_name: str | None = None) -> jnp.ndarray:
    """Mean squared pixel residual over valid observations.

    With `axis_name`, the observation table is sharded over that mesh axis
    (cameras/points replicated) and partial sums are psum-reduced.
    """
    C = prob.cam_params.shape[0]
    P = prob.points.shape[0]
    oc = jnp.clip(prob.obs_cam, 0, C - 1)
    op = jnp.clip(prob.obs_point, 0, P - 1)
    w = (
        prob.obs_valid & prob.cam_valid[oc] & prob.point_valid[op]
    ).astype(prob.points.dtype)
    r = jax.vmap(_residual_one, in_axes=(0, 0, 0, None))(
        prob.cam_params[oc], prob.points[op], prob.obs_uv, prob.K
    )
    num = jnp.sum(jnp.sum(r * r, axis=-1) * w)
    den = jnp.sum(w)
    if axis_name is not None:
        num = jax.lax.psum(num, axis_name)
        den = jax.lax.psum(den, axis_name)
    return num / jnp.maximum(den, 1.0)


# ---------------------------------------------------------------------------
# 3x3 / 6x6 helpers
# ---------------------------------------------------------------------------


def _inv3(M: jnp.ndarray) -> jnp.ndarray:
    """Batched closed-form 3x3 inverse (adjugate / det). (..., 3, 3)."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    Cc = d * h - e * g
    D = -(b * i - c * h)
    E = a * i - c * g
    F = -(a * h - b * g)
    G = b * f - c * e
    H = -(a * f - c * d)
    I = a * e - b * d
    det = a * A + b * B + c * Cc
    inv_det = jnp.where(jnp.abs(det) < 1e-20, 0.0, 1.0 / det)
    adj = jnp.stack(
        [
            jnp.stack([A, D, G], axis=-1),
            jnp.stack([B, E, H], axis=-1),
            jnp.stack([Cc, F, I], axis=-1),
        ],
        axis=-2,
    )
    return adj * inv_det[..., None, None]


# ---------------------------------------------------------------------------
# One damped Gauss-Newton (LM inner) solve
# ---------------------------------------------------------------------------


def _lm_solve(prob: BAProblem, lam: jnp.ndarray, cg_iters: int,
              axis_name: str | None = None):
    """Solve the damped normal equations via Schur + PCG.

    Returns (delta_cam (C,6), delta_pts (P,3)). With `axis_name`, the
    observation arrays hold this device's shard and every segment-sum is
    followed by a psum over the mesh axis — per-device Schur elimination
    with collective aggregation of the reduced camera system (the
    distributed-BA design of SURVEY.md §2.3).
    """
    def allreduce(x):
        return jax.lax.psum(x, axis_name) if axis_name is not None else x
    C = prob.cam_params.shape[0]
    P = prob.points.shape[0]
    r, A, B, w, oc, op = _gather_residuals(prob)

    # Blocks. W_o = A_o^T B_o (6x3); U_c, V_p by segment-sum.
    AtA = jnp.einsum("oij,oik->ojk", A, A)  # (O, 6, 6)
    BtB = jnp.einsum("oij,oik->ojk", B, B)  # (O, 3, 3)
    W = jnp.einsum("oij,oik->ojk", A, B)  # (O, 6, 3)
    Atr = jnp.einsum("oij,oi->oj", A, r)  # (O, 6)
    Btr = jnp.einsum("oij,oi->oj", B, r)  # (O, 3)

    U = allreduce(jax.ops.segment_sum(AtA, oc, num_segments=C))  # (C, 6, 6)
    V = allreduce(jax.ops.segment_sum(BtB, op, num_segments=P))  # (P, 3, 3)
    g_c = -allreduce(jax.ops.segment_sum(Atr, oc, num_segments=C))  # (C, 6)
    g_p = -allreduce(jax.ops.segment_sum(Btr, op, num_segments=P))  # (P, 3)

    # LM damping (Marquardt scaling on the diagonal + absolute floor).
    eye6 = jnp.eye(6, dtype=U.dtype)
    eye3 = jnp.eye(3, dtype=V.dtype)
    U = U + (lam * jax.vmap(jnp.diag)(jax.vmap(jnp.diagonal)(U)) + 1e-6 * eye6)
    V = V + (lam * jax.vmap(jnp.diag)(jax.vmap(jnp.diagonal)(V)) + 1e-6 * eye3)
    V_inv = _inv3(V)

    # Schur RHS: b = g_c - W V^-1 g_p, accumulated over observations.
    Vg = jnp.einsum("pij,pj->pi", V_inv, g_p)  # (P, 3)
    WVg = jnp.einsum("oij,oj->oi", W, Vg[op])  # (O, 6)
    b = g_c - allreduce(jax.ops.segment_sum(WVg, oc, num_segments=C))  # (C, 6)

    def S_apply(x):  # x: (C, 6) -> (C, 6), matrix-free S @ x
        Ux = jnp.einsum("cij,cj->ci", U, x)
        Wtx = jnp.einsum("oij,oi->oj", W, x[oc])  # (O, 3) = W_o^T x_{c(o)}
        y = allreduce(jax.ops.segment_sum(Wtx, op, num_segments=P))  # (P, 3)
        z = jnp.einsum("pij,pj->pi", V_inv, y)
        Wz = jnp.einsum("oij,oj->oi", W, z[op])  # (O, 6)
        back = allreduce(jax.ops.segment_sum(Wz, oc, num_segments=C))
        return Ux - back

    # Block-Jacobi preconditioner: U_c^{-1} (6x6 solve per camera).
    U_inv = jnp.linalg.inv(U + 1e-5 * eye6)

    def precond(x):
        return jnp.einsum("cij,cj->ci", U_inv, x)

    def dot(a, b_):
        return jnp.sum(a * b_)

    x0 = jnp.zeros_like(b)
    r0 = b - S_apply(x0)
    z0 = precond(r0)
    p0 = z0

    def cg_step(_, carry):
        x, rr, z, p = carry
        Sp = S_apply(p)
        denom = dot(p, Sp)
        alpha = jnp.where(jnp.abs(denom) < 1e-20, 0.0, dot(rr, z) / denom)
        x_new = x + alpha * p
        r_new = rr - alpha * Sp
        z_new = precond(r_new)
        beta_den = dot(rr, z)
        beta = jnp.where(jnp.abs(beta_den) < 1e-20, 0.0, dot(r_new, z_new) / beta_den)
        p_new = z_new + beta * p
        return (x_new, r_new, z_new, p_new)

    x, _, _, _ = jax.lax.fori_loop(0, cg_iters, cg_step, (x0, r0, z0, p0))
    delta_cam = x

    # Back-substitute point updates: dp = V^-1 (g_p - W^T dc).
    Wtdc = jnp.einsum("oij,oi->oj", W, delta_cam[oc])  # (O, 3)
    acc = allreduce(jax.ops.segment_sum(Wtdc, op, num_segments=P))
    delta_pts = jnp.einsum("pij,pj->pi", V_inv, g_p - acc)
    return delta_cam, delta_pts


# ---------------------------------------------------------------------------
# LM outer loop
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("max_iterations", "cg_iters", "axis_name"))
def run_ba(
    prob: BAProblem,
    max_iterations: int = 20,
    cg_iters: int = 20,
    damping_init: float = 1e-3,
    damping_up: float = 4.0,
    damping_down: float = 2.0,
    axis_name: str | None = None,
) -> tuple[BAProblem, BAStats]:
    """Levenberg-Marquardt with accept/reject and multiplicative damping.

    With `axis_name` (inside shard_map), observation arrays are per-device
    shards; camera/point state is replicated and updates are identical on
    every device (all reductions are psum'd, so the LM trajectory is
    bitwise-identical across devices).
    """
    cost0 = _cost(prob, axis_name)

    def body(carry):
        prob, lam, cost, it, accepted = carry
        dc, dp = _lm_solve(prob, lam, cg_iters, axis_name)
        cand = prob._replace(
            cam_params=prob.cam_params + dc, points=prob.points + dp
        )
        new_cost = _cost(cand, axis_name)
        improve = new_cost < cost
        prob = jax.tree_util.tree_map(
            lambda new, old: jnp.where(improve, new, old), cand, prob
        )
        lam = jnp.where(improve, lam / damping_down, lam * damping_up)
        lam = jnp.clip(lam, 1e-9, 1e6)
        cost = jnp.where(improve, new_cost, cost)
        return (prob, lam, cost, it + 1, accepted + improve.astype(jnp.int32))

    def cond(carry):
        _, lam, _, it, _ = carry
        return (it < max_iterations) & (lam < 1e5)

    lam0 = jnp.asarray(damping_init, prob.points.dtype)
    prob, lam, cost, it, accepted = jax.lax.while_loop(
        cond, body, (prob, lam0, cost0, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
    )
    return prob, BAStats(
        initial_cost=cost0, final_cost=cost, iterations=it, accepted=accepted
    )


def bundle_adjust_map(
    state: MapState,
    max_iterations: int = 20,
    cg_iters: int = 20,
    frozen_first: int = 1,
) -> tuple[MapState, BAStats]:
    """Convenience: map -> BA -> map."""
    prob = problem_from_map(state, frozen_first=frozen_first)
    prob, stats = run_ba(prob, max_iterations=max_iterations, cg_iters=cg_iters)
    return write_back_to_map(state, prob), stats
