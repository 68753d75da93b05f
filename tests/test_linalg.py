"""smallest_eigvec (damped inverse iteration) vs eigh ground truth.

The RANSAC DLT solvers (pnp.pnp_dlt, homography.homography_dlt with
method="inviter") rely on this helper returning the same null vector as
jnp.linalg.eigh for Gram matrices with a near-zero smallest eigenvalue.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sfm_mvs_tpu.ops import linalg


def _gram_with_gap(rng, d, null_dim=1, noise=0.0):
    """Random PSD (d,d) Gram matrix with `null_dim` ~zero eigenvalues."""
    A = rng.standard_normal((d * 2, d)).astype(np.float32)
    Q, _ = np.linalg.qr(rng.standard_normal((d, d)))
    evals = np.concatenate(
        [np.full(null_dim, noise), rng.uniform(1.0, 10.0, d - null_dim)]
    ).astype(np.float32)
    return (Q * evals) @ Q.T, Q[:, 0]


@pytest.mark.parametrize("d", [9, 12])
def test_matches_eigh_on_gapped_gram(d):
    rng = np.random.default_rng(0)
    for noise in (0.0, 1e-6, 1e-4):
        G, v_true = _gram_with_gap(rng, d, noise=noise)
        v = np.asarray(linalg.smallest_eigvec(jnp.asarray(G)))
        assert abs(float(v @ v_true)) > 0.9999, (d, noise)


def test_batched_vmap_agrees_with_loop():
    rng = np.random.default_rng(1)
    mats, vecs = zip(*[_gram_with_gap(rng, 12, noise=1e-5) for _ in range(64)])
    G = jnp.asarray(np.stack(mats))
    V = np.asarray(jax.vmap(linalg.smallest_eigvec)(G))
    dots = np.abs(np.einsum("bd,bd->b", V, np.stack(vecs)))
    assert dots.min() > 0.999


def test_unit_norm_output():
    rng = np.random.default_rng(2)
    G, _ = _gram_with_gap(rng, 9)
    v = np.asarray(linalg.smallest_eigvec(jnp.asarray(G)))
    np.testing.assert_allclose(np.linalg.norm(v), 1.0, atol=1e-4)


def test_null_vector_orthogonal_to_ones():
    """A null vector exactly orthogonal to the all-ones start vector must
    still be recovered (the second deterministic start covers it)."""
    d = 8
    v = np.zeros(d, np.float32)
    v[0], v[1] = 1.0, -1.0  # ones @ v == 0
    v /= np.linalg.norm(v)
    rng = np.random.default_rng(3)
    # Orthonormal basis with v as the first column.
    M = np.concatenate([v[:, None], rng.standard_normal((d, d - 1))], axis=1)
    Q, _ = np.linalg.qr(M)
    Q[:, 0] = v
    evals = np.concatenate([[0.0], rng.uniform(1.0, 10.0, d - 1)]).astype(
        np.float32
    )
    G = (Q * evals) @ Q.T
    got = np.asarray(linalg.smallest_eigvec(jnp.asarray(G.astype(np.float32))))
    assert abs(float(got @ v)) > 0.999
