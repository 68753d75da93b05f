"""Rodrigues exp/log map vs closed-form and cv2 oracle (SURVEY.md §4)."""

import numpy as np
import pytest

import jax.numpy as jnp

from sfm_mvs_tpu.ops import lie

cv2 = pytest.importorskip("cv2")


def test_exp_identity():
    R = lie.so3_exp(jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)


def test_exp_matches_cv2_rodrigues(rng):
    for _ in range(20):
        w = rng.normal(scale=1.5, size=3).astype(np.float32)
        R_ours = np.asarray(lie.so3_exp(jnp.asarray(w)))
        R_cv, _ = cv2.Rodrigues(w.astype(np.float64))
        np.testing.assert_allclose(R_ours, R_cv, atol=1e-5)


def test_log_roundtrip(rng):
    for scale in [1e-5, 0.1, 1.0, 2.5]:
        w = rng.normal(size=3)
        w = (w / np.linalg.norm(w) * scale).astype(np.float32)
        w2 = np.asarray(lie.so3_log(lie.so3_exp(jnp.asarray(w))))
        np.testing.assert_allclose(w2, w, atol=1e-4)


def test_log_near_and_at_pi(rng):
    """theta ~ pi round trip (round-5 regression: the antisymmetric-part
    formula collapsed there — a full-orbit camera at azimuth ~180 deg got
    rvec norms ~240 and the PnP polish diverged from a perfect pose)."""
    for th in [np.pi - 0.05, np.pi - 1e-3, np.pi - 1e-6, np.pi]:
        for _ in range(20):
            ax = rng.normal(size=3)
            ax /= np.linalg.norm(ax)
            w = jnp.asarray(ax * th, jnp.float32)
            R = lie.so3_exp(w)
            w2 = lie.so3_log(R)
            # rvec magnitude must stay bounded by pi (mod the +-n at-pi
            # ambiguity) and the ROTATION must round-trip.
            assert float(jnp.linalg.norm(w2)) < np.pi + 1e-3
            R2 = lie.so3_exp(w2)
            np.testing.assert_allclose(
                np.asarray(R2), np.asarray(R), atol=2e-3
            )
            # cv2 oracle agrees on the rotation (not the sign of n at pi).
            R_cv, _ = cv2.Rodrigues(np.asarray(w2, np.float64))
            np.testing.assert_allclose(np.asarray(R2), R_cv, atol=2e-3)


def test_exp_is_rotation(rng):
    w = jnp.asarray(rng.normal(size=(32, 3)).astype(np.float32))
    R = np.asarray(lie.so3_exp(w))
    eyes = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eyes, np.broadcast_to(np.eye(3), eyes.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_orthonormalize(rng):
    R = np.asarray(lie.so3_exp(jnp.asarray(rng.normal(size=3).astype(np.float32))))
    noisy = R + 0.01 * rng.normal(size=(3, 3)).astype(np.float32)
    R2 = np.asarray(lie.orthonormalize(jnp.asarray(noisy)))
    np.testing.assert_allclose(R2 @ R2.T, np.eye(3), atol=1e-5)
    assert np.linalg.det(R2) > 0.999
    assert np.abs(R2 - R).max() < 0.05


def test_rt_matrix_roundtrip(rng):
    rvec = jnp.asarray(rng.normal(size=3).astype(np.float32))
    tvec = jnp.asarray(rng.normal(size=3).astype(np.float32))
    Rt = lie.rt_to_matrix(rvec, tvec)
    assert Rt.shape == (3, 4)
    r2, t2 = lie.matrix_to_rt(Rt)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(rvec), atol=1e-4)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(tvec), atol=1e-6)
