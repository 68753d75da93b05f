"""Essential-matrix estimation + pose recovery vs ground truth and cv2."""

import numpy as np
import pytest

import jax.numpy as jnp

from sfm_mvs_tpu.ops import epipolar, projection
from sfm_mvs_tpu.utils.synthetic import make_scene

cv2 = pytest.importorskip("cv2")


def _two_view(seed=0, noise=0.0, n=256):
    scene = make_scene(num_points=n, num_cameras=2, seed=seed)
    uv0, _ = scene.project(0)
    uv1, _ = scene.project(1)
    if noise:
        r = np.random.default_rng(seed + 1)
        uv0 = uv0 + r.normal(scale=noise, size=uv0.shape)
        uv1 = uv1 + r.normal(scale=noise, size=uv1.shape)
    # relative pose cam0 -> cam1
    R0, t0 = scene.Rt[0, :, :3], scene.Rt[0, :, 3]
    R1, t1 = scene.Rt[1, :, :3], scene.Rt[1, :, 3]
    R_rel = R1 @ R0.T
    t_rel = t1 - R_rel @ t0
    n0 = np.asarray(projection.normalize_points(jnp.asarray(uv0.astype(np.float32)), jnp.asarray(scene.K)))
    n1 = np.asarray(projection.normalize_points(jnp.asarray(uv1.astype(np.float32)), jnp.asarray(scene.K)))
    return scene, n0, n1, R_rel, t_rel


def _essential_from_pose(R, t):
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    return tx @ R


def test_eight_point_recovers_E():
    _, n0, n1, R_rel, t_rel = _two_view()
    E = np.asarray(epipolar.essential_eight_point(jnp.asarray(n0), jnp.asarray(n1)))
    E_true = _essential_from_pose(R_rel, t_rel / np.linalg.norm(t_rel))
    E_true /= np.linalg.norm(E_true)
    E_est = E / np.linalg.norm(E)
    if np.sum(E_est * E_true) < 0:
        E_est = -E_est
    assert np.abs(E_est - E_true).max() < 1e-4


def test_sampson_error_zero_for_inliers():
    _, n0, n1, R_rel, t_rel = _two_view()
    E = epipolar.essential_eight_point(jnp.asarray(n0), jnp.asarray(n1))
    err = np.asarray(epipolar.sampson_error(E, jnp.asarray(n0), jnp.asarray(n1)))
    assert err.max() < 1e-6


def test_recover_pose_matches_truth():
    _, n0, n1, R_rel, t_rel = _two_view()
    E = epipolar.essential_eight_point(jnp.asarray(n0), jnp.asarray(n1))
    mask = jnp.ones(n0.shape[0], dtype=bool)
    R, t, cheir = epipolar.recover_pose(E, jnp.asarray(n0), jnp.asarray(n1), mask)
    R, t = np.asarray(R), np.asarray(t)
    np.testing.assert_allclose(R, R_rel, atol=1e-3)
    t_unit = t_rel / np.linalg.norm(t_rel)
    np.testing.assert_allclose(t, t_unit, atol=1e-3)
    assert np.asarray(cheir).mean() > 0.99


def test_recover_pose_matches_cv2_with_noise():
    scene, n0, n1, R_rel, t_rel = _two_view(noise=0.5)
    E = epipolar.essential_eight_point(
        jnp.asarray(n0.astype(np.float32)), jnp.asarray(n1.astype(np.float32))
    )
    mask = jnp.ones(n0.shape[0], dtype=bool)
    R, t, _ = epipolar.recover_pose(E, jnp.asarray(n0.astype(np.float32)), jnp.asarray(n1.astype(np.float32)), mask)
    # cv2 oracle on the same normalized points
    E_cv, _ = cv2.findEssentialMat(n0, n1, np.eye(3), method=cv2.LMEDS)
    _, R_cv, t_cv, _ = cv2.recoverPose(E_cv, n0, n1, np.eye(3))
    # both should be close to ground truth
    assert np.abs(np.asarray(R) - R_rel).max() < 0.02
    assert np.abs(np.asarray(R_cv) - R_rel).max() < 0.02


def test_weighted_masking():
    _, n0, n1, R_rel, t_rel = _two_view(n=64)
    # corrupt half the points; zero weights must mask them out
    n0c = n0.copy()
    n0c[32:] += 0.3
    w = (np.arange(64) < 32).astype(np.float32)
    E = np.asarray(
        epipolar.essential_eight_point(
            jnp.asarray(n0c.astype(np.float32)),
            jnp.asarray(n1.astype(np.float32)),
            jnp.asarray(w),
        )
    )
    E_true = _essential_from_pose(R_rel, t_rel / np.linalg.norm(t_rel))
    E_true /= np.linalg.norm(E_true)
    E_est = E / np.linalg.norm(E)
    if np.sum(E_est * E_true) < 0:
        E_est = -E_est
    assert np.abs(E_est - E_true).max() < 1e-3


def test_fundamental_eight_point():
    scene = make_scene(num_points=128, num_cameras=2, seed=7)
    uv0, _ = scene.project(0)
    uv1, _ = scene.project(1)
    F = np.asarray(
        epipolar.fundamental_eight_point(
            jnp.asarray(uv0.astype(np.float32)), jnp.asarray(uv1.astype(np.float32))
        )
    )
    x0 = np.concatenate([uv0, np.ones((128, 1))], axis=1)
    x1 = np.concatenate([uv1, np.ones((128, 1))], axis=1)
    resid = np.abs(np.sum(x1 * (x0 @ F.T), axis=1))
    assert np.median(resid) < 1e-2


def test_homography_decomposition_recovers_planar_pose(rng):
    """Faugeras decomposition: exact pose from a plane-induced homography."""
    from sfm_mvs_tpu.ops import lie
    from sfm_mvs_tpu.ops.homography import homography_dlt

    n = np.array([0.2, -0.1, 0.97]); n /= np.linalg.norm(n)
    d = 5.0
    basis = np.linalg.svd(n[None])[2][1:]
    uvp = rng.uniform(-2, 2, (200, 2))
    X1 = d * n + uvp @ basis
    R = np.asarray(lie.so3_exp(jnp.asarray(np.array([0.05, -0.12, 0.03], np.float32))))
    t = np.array([0.4, 0.1, -0.2], np.float32)
    X2 = X1 @ R.T + t
    p1 = (X1[:, :2] / X1[:, 2:3]).astype(np.float32)
    p2 = (X2[:, :2] / X2[:, 2:3]).astype(np.float32)
    Hn = homography_dlt(jnp.asarray(p1), jnp.asarray(p2))
    Rr, tr, mask = epipolar.recover_pose_from_homography(
        Hn, jnp.asarray(p1), jnp.asarray(p2), jnp.ones(200, bool)
    )
    np.testing.assert_allclose(np.asarray(Rr), R, atol=1e-4)
    tu = t / np.linalg.norm(t)
    trn = np.array(tr); trn = trn / np.linalg.norm(trn)
    assert min(np.abs(trn - tu).max(), np.abs(trn + tu).max()) < 1e-3
    assert float(mask.mean()) > 0.99


def test_refine_relative_pose_improves_noisy_estimate():
    """Sampson-manifold GN polish: 5-point-level accuracy from 8-point."""
    scene, n0, n1, R_rel, t_rel = _two_view(noise=0.8, seed=1)
    n0 = jnp.asarray(n0.astype(np.float32))
    n1 = jnp.asarray(n1.astype(np.float32))
    E = epipolar.essential_eight_point(n0, n1)
    mask = jnp.ones(n0.shape[0], dtype=bool)
    R8, t8, ch = epipolar.recover_pose(E, n0, n1, mask)
    Rr, tr = epipolar.refine_relative_pose(R8, t8, n0, n1, ch)
    tu = t_rel / np.linalg.norm(t_rel)

    def t_err(t):
        t = np.asarray(t)
        return min(np.abs(t - tu).max(), np.abs(t + tu).max())

    assert t_err(tr) <= t_err(t8) + 1e-6  # never degrades
    assert t_err(tr) < 0.001
    assert np.abs(np.asarray(Rr) - R_rel).max() < 0.001
