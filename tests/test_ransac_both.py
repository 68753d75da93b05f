"""Joint 8pt+5pt hypothesis pool ("both"): auto-selects the family that
fits the data, mirroring the reference's Nister-inside-RANSAC
(sfm.py:307) without giving up the cheap 8pt winners on dense pairs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from sfm_mvs_tpu.ops import projection, ransac
from sfm_mvs_tpu.ops.epipolar import recover_pose
from sfm_mvs_tpu.utils.synthetic import make_scene


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _pose_error(res, scene, n0, n1):
    R0, t0 = scene.Rt[0, :, :3], scene.Rt[0, :, 3]
    R1, t1 = scene.Rt[1, :, :3], scene.Rt[1, :, 3]
    R_rel = R1 @ R0.T
    t_rel = t1 - R_rel @ t0
    t_rel /= max(np.linalg.norm(t_rel), 1e-9)
    R, t, _ = recover_pose(res.model, n0, n1, res.inliers)
    return max(
        np.abs(np.asarray(R) - R_rel).max(), np.abs(np.asarray(t) - t_rel).max()
    )


def _norm_pair(scene, uv0, uv1):
    K = jnp.asarray(scene.K)
    n0 = projection.normalize_points(jnp.asarray(uv0.astype(np.float32)), K)
    n1 = projection.normalize_points(jnp.asarray(uv1.astype(np.float32)), K)
    return n0, n1, K


def test_both_matches_8pt_on_dense_pairs(rng):
    scene = make_scene(num_points=512, num_cameras=2)
    uv0, _ = scene.project(0)
    uv1, _ = scene.project(1)
    n0, n1, K = _norm_pair(scene, uv0, uv1)
    m = jnp.ones(512, bool)
    res_b = ransac.ransac_essential(
        jax.random.PRNGKey(0), n0, n1, m, K[0, 0],
        threshold_px=1.0, iters=128, solver="both",
    )
    res_8 = ransac.ransac_essential(
        jax.random.PRNGKey(0), n0, n1, m, K[0, 0],
        threshold_px=1.0, iters=128, solver="8pt",
    )
    assert int(res_b.num_inliers) >= int(res_8.num_inliers) - 5
    assert _pose_error(res_b, scene, n0, n1) < 5e-3


def test_small_n_noisy_bootstrap_8pt_fails_both_succeeds(rng):
    """A 14-correspondence noisy bootstrap: the 8pt minimal solver must
    draw 8 of 14 noisy points per sample and cannot produce a clean pose;
    the Nister family in "both" needs only 5 and recovers it."""
    scene = make_scene(num_points=14, num_cameras=2, seed=3)
    uv0, _ = scene.project(0)
    uv1, _ = scene.project(1)
    uv0 = uv0 + rng.normal(scale=0.8, size=uv0.shape)
    uv1 = uv1 + rng.normal(scale=0.8, size=uv1.shape)
    n0, n1, K = _norm_pair(scene, uv0, uv1)
    m = jnp.ones(14, bool)

    def run(solver, key):
        return ransac.ransac_essential(
            jax.random.PRNGKey(key), n0, n1, m, K[0, 0],
            threshold_px=1.5, iters=256, solver=solver, refit_rounds=0,
        )

    err8 = min(_pose_error(run("8pt", k), scene, n0, n1) for k in range(3))
    errb = min(_pose_error(run("both", k), scene, n0, n1) for k in range(3))
    assert errb < 0.05  # Nister family nails the pose
    assert errb < err8  # and strictly beats the 8pt-only pool


def test_both_survives_planar_scene():
    from tests.test_five_point import _synth_pair

    x1, x2, E_true, R_true, t_true = _synth_pair(11, planar=True, n=256)
    n0, n1 = jnp.asarray(x1), jnp.asarray(x2)
    res = ransac.ransac_essential(
        jax.random.PRNGKey(1), n0, n1, jnp.ones(256, bool),
        jnp.asarray(1200.0), threshold_px=1.0, iters=64, solver="both",
    )
    assert int(res.num_inliers) > 200
