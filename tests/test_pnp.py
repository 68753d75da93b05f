"""PnP DLT + Gauss-Newton refinement vs ground-truth poses."""

import numpy as np

import jax.numpy as jnp

from sfm_mvs_tpu.ops import lie, pnp, projection
from sfm_mvs_tpu.utils.synthetic import make_scene


def _setup(seed=0, n=64, noise=0.0, cam=1):
    scene = make_scene(num_points=n, num_cameras=2, seed=seed)
    uv, _ = scene.project(cam)
    if noise:
        r = np.random.default_rng(seed + 10)
        uv = uv + r.normal(scale=noise, size=uv.shape)
    uv = uv.astype(np.float32)
    uvn = np.asarray(projection.normalize_points(jnp.asarray(uv), jnp.asarray(scene.K)))
    return scene, uv, uvn, scene.Rt[cam]


def test_dlt_recovers_pose_noiseless():
    scene, uv, uvn, Rt_true = _setup()
    Rt = np.asarray(pnp.pnp_dlt(jnp.asarray(scene.points), jnp.asarray(uvn)))
    np.testing.assert_allclose(Rt[:, :3], Rt_true[:, :3], atol=2e-3)
    np.testing.assert_allclose(Rt[:, 3], Rt_true[:, 3], atol=2e-2)


def test_dlt_minimal_six_points():
    scene, uv, uvn, Rt_true = _setup(n=6, seed=4)
    Rt = np.asarray(pnp.pnp_dlt(jnp.asarray(scene.points), jnp.asarray(uvn)))
    np.testing.assert_allclose(Rt[:, :3], Rt_true[:, :3], atol=5e-3)


def test_gauss_newton_improves_noisy_pose():
    scene, uv, uvn, Rt_true = _setup(n=128, noise=1.0)
    # Perturb the true pose.
    rvec, tvec = lie.matrix_to_rt(jnp.asarray(Rt_true))
    Rt0 = lie.rt_to_matrix(rvec + 0.03, tvec + 0.1)
    mask = jnp.ones(128, dtype=bool)
    err0 = float(projection.masked_rms_reprojection_error(
        jnp.asarray(scene.points), jnp.asarray(uv), Rt0, jnp.asarray(scene.K), mask))
    Rt1 = pnp.refine_pose_gauss_newton(
        Rt0, jnp.asarray(scene.points), jnp.asarray(uv), mask, jnp.asarray(scene.K))
    err1 = float(projection.masked_rms_reprojection_error(
        jnp.asarray(scene.points), jnp.asarray(uv), Rt1, jnp.asarray(scene.K), mask))
    assert err1 < err0 * 0.2
    assert err1 < 1.5  # near the noise floor


def test_residual_pixels():
    scene, uv, uvn, Rt_true = _setup()
    res = np.asarray(pnp.pnp_residual_pixels(
        jnp.asarray(Rt_true), jnp.asarray(scene.points), jnp.asarray(uv),
        jnp.asarray(scene.K)))
    assert res.max() < 1e-2
