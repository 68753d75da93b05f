"""Essential/fundamental matrix estimation and pose recovery.

TPU-native replacement for ``cv2.findEssentialMat`` (sfm.py:307; the 5-point
Nister solver inside OpenCV's RANSAC) and ``cv2.recoverPose`` (sfm.py:311).

Design (SURVEY.md §7): the minimal solver is the normalized 8-point
algorithm with projection onto the essential manifold (equal singular
values, rank 2) — float32-friendly on normalized coordinates and exact
enough at the reference's inlier ratios. It is fully vmappable, so RANSAC
becomes thousands of simultaneous hypothesis solves (see ransac.py) instead
of OpenCV's sequential C++ loop. Pose recovery decomposes E into its 4
(R, t) candidates and selects by batched cheirality voting, exactly the
behavior of cv2.recoverPose.
"""

from __future__ import annotations

import jax.numpy as jnp

from sfm_mvs_tpu.ops import triangulation
from sfm_mvs_tpu.ops.projection import hartley_normalization


def essential_eight_point(
    pts1: jnp.ndarray,
    pts2: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    method: str = "svd",
) -> jnp.ndarray:
    """Weighted 8-point essential matrix on *normalized camera* coordinates.

    pts1, pts2: (N, 2) normalized coords (pixels pre-multiplied by K^-1);
    weights: optional (N,) non-negative weights (0 masks a row out).
    Returns E: (3, 3) projected onto the essential manifold
    (singular values (1, 1, 0)).

    method: null-vector solver. "svd" of A directly is precise (forming
    the normal matrix squares the condition number and costs ~3 decimal
    digits in f32 — measured 1.3px vs 0.0005px max Sampson residual at
    f=1200); "eigh" of A^T A is several times faster on TPU. RANSAC uses
    "eigh" for its thousands of vmapped hypothesis solves (threshold-level
    precision suffices there) and "svd" for the few inlier refits.

    N may be the 8-point minimal sample or all inliers (for refit).
    """
    x1, y1 = pts1[:, 0], pts1[:, 1]
    x2, y2 = pts2[:, 0], pts2[:, 1]
    ones = jnp.ones_like(x1)
    # Epipolar constraint rows: x2^T E x1 = 0.
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones], axis=-1
    )
    if weights is not None:
        A = A * weights[:, None]
    if method == "eigh":
        _, V = jnp.linalg.eigh(A.T @ A)
        E = V[:, 0].reshape(3, 3)
    else:
        _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
        E = Vt[-1].reshape(3, 3)
    # Project onto the essential manifold: singular values -> (1, 1, 0).
    U, _, Vt = jnp.linalg.svd(E)
    E = U @ jnp.diag(jnp.array([1.0, 1.0, 0.0], dtype=E.dtype)) @ Vt
    return E


def fundamental_eight_point(
    pts1: jnp.ndarray,
    pts2: jnp.ndarray,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Hartley-normalized 8-point fundamental matrix on *pixel* coords.

    Rank-2 projection included. Returns F: (3, 3).
    """
    if mask is None:
        mask = jnp.ones(pts1.shape[0], dtype=bool)
    n1, T1 = hartley_normalization(pts1, mask)
    n2, T2 = hartley_normalization(pts2, mask)
    x1, y1 = n1[:, 0], n1[:, 1]
    x2, y2 = n2[:, 0], n2[:, 1]
    ones = jnp.ones_like(x1)
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones], axis=-1
    )
    A = A * mask.astype(A.dtype)[:, None]
    _, _, Vt0 = jnp.linalg.svd(A, full_matrices=True)
    F = Vt0[-1].reshape(3, 3)
    U, S, Vt = jnp.linalg.svd(F)
    S = S.at[2].set(0.0)
    F = U @ jnp.diag(S) @ Vt
    return T2.T @ F @ T1


def sampson_error(E: jnp.ndarray, pts1: jnp.ndarray, pts2: jnp.ndarray) -> jnp.ndarray:
    """First-order geometric (Sampson) distance per correspondence.

    E (or F): (3, 3); pts1, pts2: (N, 2) in the same coordinate frame as E.
    Returns (N,) squared Sampson distances.
    """
    x1 = jnp.concatenate([pts1, jnp.ones_like(pts1[:, :1])], axis=-1)  # (N,3)
    x2 = jnp.concatenate([pts2, jnp.ones_like(pts2[:, :1])], axis=-1)
    Ex1 = x1 @ E.T  # (N, 3) = (E @ x1^T)^T
    Etx2 = x2 @ E  # (N, 3) = (E^T @ x2^T)^T
    x2tEx1 = jnp.sum(x2 * Ex1, axis=-1)
    denom = Ex1[:, 0] ** 2 + Ex1[:, 1] ** 2 + Etx2[:, 0] ** 2 + Etx2[:, 1] ** 2
    return (x2tEx1 * x2tEx1) / jnp.maximum(denom, 1e-12)


def epipolar_residual_pixels(
    E: jnp.ndarray, pts1: jnp.ndarray, pts2: jnp.ndarray, focal: jnp.ndarray
) -> jnp.ndarray:
    """Sampson distance (not squared) rescaled to ~pixels via the focal length.

    Used as the RANSAC residual so thresholds are directly comparable to the
    reference's pixel threshold (0.4 px, sfm.py:307).
    """
    return jnp.sqrt(sampson_error(E, pts1, pts2)) * focal


def decompose_essential(E: jnp.ndarray):
    """E -> the 4 candidate (R, t) relative poses.

    Returns (Rs: (4, 3, 3), ts: (4, 3)). t is unit-norm; candidates are
    (R1, +t), (R1, -t), (R2, +t), (R2, -t) per Hartley & Zisserman 9.6.2.
    """
    U, _, Vt = jnp.linalg.svd(E)
    # Enforce proper rotations.
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], dtype=E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


def recover_pose(
    E: jnp.ndarray,
    pts1: jnp.ndarray,
    pts2: jnp.ndarray,
    mask: jnp.ndarray,
):
    """Select the (R, t) candidate with the most points in front of both cams.

    pts1, pts2: (N, 2) *normalized camera* coordinates; mask: (N,) validity.
    Returns (R (3,3), t (3,), cheirality_mask (N,) — valid & positive-depth
    in both cameras under the winning pose). Matches cv2.recoverPose
    (sfm.py:311-313) including its output inlier mask semantics.
    """
    Rs, ts = decompose_essential(E)
    P1 = jnp.concatenate([jnp.eye(3, dtype=E.dtype), jnp.zeros((3, 1), E.dtype)], axis=1)

    def cheirality(R, t):
        Rt2 = jnp.concatenate([R, t[:, None]], axis=1)
        X = triangulation.triangulate_euclidean(P1, Rt2, pts1, pts2)
        d1, d2 = triangulation.triangulation_depths(P1, Rt2, X)
        good = (d1 > 0) & (d2 > 0) & mask
        return good, jnp.sum(good)

    goods, counts = [], []
    for k in range(4):
        g, c = cheirality(Rs[k], ts[k])
        goods.append(g)
        counts.append(c)
    counts = jnp.stack(counts)
    goods = jnp.stack(goods)
    best = jnp.argmax(counts)
    return Rs[best], ts[best], goods[best]
