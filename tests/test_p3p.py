"""P3P (Grunert quartic) minimal solver: exactness + degeneracy handling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sfm_mvs_tpu.ops import lie, p3p


def _random_pose(rng):
    rvec = rng.standard_normal(3).astype(np.float32) * 0.5
    t = rng.standard_normal(3).astype(np.float32)
    R = np.asarray(lie.so3_exp(jnp.asarray(rvec)))
    return R, t


def _project_norm(R, t, X):
    Y = X @ R.T + t
    return Y[:, :2] / Y[:, 2:3]


def _best_pose_error(Rts, valid, R_true, t_true):
    errs = []
    for Rt, ok in zip(np.asarray(Rts), np.asarray(valid)):
        if not ok:
            continue
        errs.append(
            np.linalg.norm(Rt[:, :3] - R_true) + np.linalg.norm(Rt[:, 3] - t_true)
        )
    return min(errs) if errs else np.inf


@pytest.mark.parametrize("seed", range(8))
def test_recovers_exact_pose(seed):
    rng = np.random.default_rng(seed)
    R, t = _random_pose(rng)
    # Points in front of the camera: sample in camera frame, lift to world.
    Yc = rng.uniform(-1, 1, (3, 3)).astype(np.float32)
    Yc[:, 2] = rng.uniform(2.0, 6.0, 3)
    X = (Yc - t) @ R  # R^T (Y - t)
    uvn = _project_norm(R, t, X)
    Rts, valid = p3p.p3p_grunert(jnp.asarray(X), jnp.asarray(uvn))
    assert np.asarray(valid).any()
    assert _best_pose_error(Rts, valid, R, t) < 1e-2, seed


@pytest.mark.slow
def test_vmapped_batch():
    rng = np.random.default_rng(42)
    Xs, uvs, poses = [], [], []
    for _ in range(16):
        R, t = _random_pose(rng)
        Yc = rng.uniform(-1, 1, (3, 3)).astype(np.float32)
        Yc[:, 2] = rng.uniform(2.0, 6.0, 3)
        X = (Yc - t) @ R
        Xs.append(X)
        uvs.append(_project_norm(R, t, X))
        poses.append((R, t))
    Rts, valid = jax.vmap(p3p.p3p_grunert)(
        jnp.asarray(np.stack(Xs)), jnp.asarray(np.stack(uvs))
    )
    for i, (R, t) in enumerate(poses):
        assert _best_pose_error(Rts[i], valid[i], R, t) < 5e-2, i


def test_collinear_points_no_nan():
    # Collinear world points: a structurally degenerate sample. All we
    # require is fixed shapes, finite outputs, and flags (garbage poses
    # lose the RANSAC argmax anyway).
    X = np.array([[0, 0, 4], [0.5, 0, 4], [1.0, 0, 4]], np.float32)
    uvn = X[:, :2] / X[:, 2:3]
    Rts, valid = p3p.p3p_grunert(jnp.asarray(X), jnp.asarray(uvn))
    assert np.isfinite(np.asarray(Rts)).all()
    assert np.asarray(valid).shape == (p3p.N_P3P_SLOTS,)


def test_behind_camera_depths_flagged():
    rng = np.random.default_rng(3)
    R, t = _random_pose(rng)
    Yc = rng.uniform(-1, 1, (3, 3)).astype(np.float32)
    Yc[:, 2] = rng.uniform(2.0, 6.0, 3)
    X = (Yc - t) @ R
    uvn = _project_norm(R, t, X)
    Rts, valid = p3p.p3p_grunert(jnp.asarray(X), jnp.asarray(uvn))
    # Every valid slot must place all three points at positive depth.
    for Rt, ok in zip(np.asarray(Rts), np.asarray(valid)):
        if ok:
            d = X @ np.asarray(Rt[:, :3]).T[..., 2] + float(Rt[2, 3])
            assert (d > 0).all()
