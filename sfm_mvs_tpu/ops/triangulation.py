"""Batched DLT triangulation.

TPU-native replacement for ``cv2.triangulatePoints`` (sfm.py:53;
test.py:310,367). Instead of a per-point C++ loop, the homogeneous DLT
system is solved for all correspondences at once: build the 4x4 A matrix
per point, take the eigenvector of A^T A with smallest eigenvalue via a
vmapped 4x4 ``eigh`` (closed-form-sized, maps well to TPU), all under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _dlt_system(P1: jnp.ndarray, P2: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray):
    """Build the 4x4 DLT matrix for one correspondence.

    Rows: u1*P1_3 - P1_1 ; v1*P1_3 - P1_2 ; u2*P2_3 - P2_1 ; v2*P2_3 - P2_2.
    """
    return jnp.stack(
        [
            x1[0] * P1[2] - P1[0],
            x1[1] * P1[2] - P1[1],
            x2[0] * P2[2] - P2[0],
            x2[1] * P2[2] - P2[1],
        ]
    )


def triangulate_points(
    P1: jnp.ndarray,
    P2: jnp.ndarray,
    pts1: jnp.ndarray,
    pts2: jnp.ndarray,
) -> jnp.ndarray:
    """DLT-triangulate N correspondences.

    P1, P2: (3, 4) projection matrices. pts1, pts2: (N, 2) pixel coords.
    Returns homogeneous points (N, 4), scaled so the last component is 1
    (matching the reference's `cloud / cloud[3]`, sfm.py:54).

    Each row of A is normalized before forming A^T A for float32
    conditioning; the smallest-eigenvector solve is exact for a 4x4 system.
    """

    def solve_one(x1, x2):
        A = _dlt_system(P1, P2, x1, x2)
        # Row-normalize for conditioning (projection matrices contain pixel-
        # scale entries; unnormalized A^T A squares that range).
        norm = jnp.linalg.norm(A, axis=1, keepdims=True)
        A = A / jnp.maximum(norm, 1e-12)
        _, V = jnp.linalg.eigh(A.T @ A)
        X = V[:, 0]  # eigenvector of the smallest eigenvalue
        return X

    X = jax.vmap(solve_one)(pts1, pts2)
    w = X[..., 3:4]
    w_safe = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    return X / w_safe


def triangulate_euclidean(
    P1: jnp.ndarray, P2: jnp.ndarray, pts1: jnp.ndarray, pts2: jnp.ndarray
) -> jnp.ndarray:
    """Like :func:`triangulate_points` but returns Euclidean (N, 3)."""
    return triangulate_points(P1, P2, pts1, pts2)[..., :3]


def triangulation_depths(
    Rt1: jnp.ndarray, Rt2: jnp.ndarray, X: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Camera-frame depths of Euclidean points X (N,3) in both cameras."""
    d1 = X @ Rt1[2, :3] + Rt1[2, 3]
    d2 = X @ Rt2[2, :3] + Rt2[2, 3]
    return d1, d2
