"""Small batched linear-algebra helpers tuned for TPU RANSAC loads.

The RANSAC hypothesis solvers (PnP DLT, homography DLT) each need the
null vector of a small Gram matrix A^T A for thousands of vmapped minimal
samples. ``jnp.linalg.eigh`` is the obvious tool but is expensive when
vmapped over small matrices on TPU (measured on v5e: 38ms for 2048 12x12
eigh). A damped inverse iteration — one Cholesky factorization plus a few
triangular solves — recovers the same null vector ~9x faster (4.2ms,
|dot| > 0.99999 agreement), because the DLT Gram matrix has a near-zero
smallest eigenvalue with a large gap to the rest, the textbook-best case
for inverse iteration.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def smallest_eigvec(G: jnp.ndarray, iters: int = 3) -> jnp.ndarray:
    """Unit eigenvector of the smallest eigenvalue of a PSD matrix.

    G: (..., D, D) symmetric positive semi-definite (a Gram matrix A^T A
    whose smallest eigenvalue is ~0 — exactly singular for noiseless
    minimal samples). Returns (..., D).

    Damped inverse iteration: factor G + lam*I once (lam = 1e-5 * mean
    diagonal, keeping the shifted matrix safely positive-definite in f32),
    then repeatedly solve and normalize. Converges in 1-2 iterations when
    the spectral gap is large; for structurally degenerate samples (e.g.
    coplanar PnP points, where the two smallest eigenvalues are both ~0)
    the result is an arbitrary vector of the near-null space — those
    hypotheses are garbage regardless of solver and lose the RANSAC argmax.
    """
    D = G.shape[-1]
    lam = 1e-5 * (jnp.trace(G, axis1=-2, axis2=-1) / D)[..., None, None]
    L = jnp.linalg.cholesky(G + lam * jnp.eye(D, dtype=G.dtype))

    def iterate(z):
        for _ in range(iters):
            z = jax.scipy.linalg.cho_solve((L, True), z[..., None])[..., 0]
            z = z / jnp.maximum(
                jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-30)
        return z

    # Two deterministic start vectors: a fixed start can be (near-)
    # orthogonal to the null vector for symmetric point configurations —
    # and systematically so across the whole vmapped batch, since every
    # sample would share it. Run inverse iteration from both and keep the
    # one with the smaller Rayleigh quotient z^T G z (the better
    # approximation of the smallest eigenvector).
    ones = jnp.ones(G.shape[:-2] + (D,), G.dtype)
    alt = jnp.where(jnp.arange(D) % 2 == 0, 1.0, -1.0).astype(G.dtype)
    alt = jnp.broadcast_to(alt, G.shape[:-2] + (D,))
    za = iterate(ones)
    zb = iterate(alt)
    ray_a = jnp.einsum("...i,...ij,...j->...", za, G, za)
    ray_b = jnp.einsum("...i,...ij,...j->...", zb, G, zb)
    return jnp.where((ray_a <= ray_b)[..., None], za, zb)
