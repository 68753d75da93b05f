"""Radial distortion (k1, k2) through the forward path.

The reference threads distortion coefficients through cv2.solvePnPRansac
and cv2.projectPoints (sfm.py:67,88); the notebook's camera model is
(rvec, t, f, k1, k2). Here: distorted projection (projection.project with
dist), front-door keypoint undistortion (incremental._undistort_features
via cfg.k1/k2), distortion-aware PnP refinement, MVS sweep with raw
distorted images, and end-to-end pose recovery on a distorted render.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax.numpy as jnp

from sfm_mvs_tpu.ops import lie, pnp, projection
from sfm_mvs_tpu.utils import evaluate
from sfm_mvs_tpu.utils.config import FrontendConfig, MapConfig, SfmConfig
from sfm_mvs_tpu.utils.synthetic import render_staircase_sequence

DIST = (-0.18, 0.03)


def test_distort_undistort_roundtrip():
    rng = np.random.default_rng(0)
    xy = jnp.asarray(rng.uniform(-0.5, 0.5, size=(500, 2)), jnp.float32)
    d = jnp.asarray(DIST, jnp.float32)
    xd = projection.distort_normalized(xy, d)
    xu = projection.undistort_normalized(xd, d)
    assert np.abs(np.asarray(xu - xy)).max() < 1e-5
    # distortion actually moves edge points (sanity that it's not a no-op)
    assert np.abs(np.asarray(xd - xy)).max() > 1e-3


def test_undistort_pixels_inverts_distorted_projection():
    K = jnp.asarray(
        [[400.0, 0, 160.0], [0, 400.0, 120.0], [0, 0, 1.0]], jnp.float32
    )
    d = jnp.asarray(DIST, jnp.float32)
    rng = np.random.default_rng(1)
    X = jnp.asarray(rng.uniform([-2, -2, 4], [2, 2, 8], (300, 3)), jnp.float32)
    Rt = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
    uv_d = projection.project(X, Rt, K, dist=d)
    uv_ideal = projection.project(X, Rt, K)
    uv_corr = projection.undistort_pixels(uv_d, K, d)
    assert np.abs(np.asarray(uv_corr - uv_ideal)).max() < 1e-2  # px


def test_pnp_gn_with_distortion_recovers_pose():
    K = jnp.asarray(
        [[400.0, 0, 160.0], [0, 400.0, 120.0], [0, 0, 1.0]], jnp.float32
    )
    d = jnp.asarray(DIST, jnp.float32)
    rng = np.random.default_rng(2)
    X = jnp.asarray(rng.uniform([-2, -2, 4], [2, 2, 8], (200, 3)), jnp.float32)
    rvec = jnp.asarray([0.03, -0.05, 0.02], jnp.float32)
    tvec = jnp.asarray([0.2, -0.1, 0.3], jnp.float32)
    Rt_true = lie.rt_to_matrix(rvec, tvec)
    uv = projection.project(X, Rt_true, K, dist=d)
    # Perturbed start; distortion-aware GN must converge to the true pose.
    Rt0 = lie.rt_to_matrix(rvec + 0.02, tvec + 0.05)
    mask = jnp.ones((200,), bool)
    Rt_ref = pnp.refine_pose_gauss_newton(Rt0, X, uv, mask, K, iters=15, dist=d)
    res = pnp.pnp_residual_pixels(Rt_ref, X, uv, K, dist=d)
    assert float(jnp.max(res)) < 1e-2
    # A distortion-UNAWARE refine against the same raw observations
    # cannot reach that residual (the model mismatch is several px).
    Rt_naive = pnp.refine_pose_gauss_newton(Rt0, X, uv, mask, K, iters=15)
    res_naive = pnp.pnp_residual_pixels(Rt_naive, X, uv, K)
    assert float(jnp.max(res_naive)) > 0.5


@pytest.fixture(scope="module")
def distorted_scene():
    return render_staircase_sequence(
        num_cameras=5, arc_degrees=24, image_size=(320, 240),
        return_depth=True, dist=DIST,
    )


def test_pipeline_on_distorted_render(distorted_scene):
    """cfg.k1/k2 front-door correction keeps trajectory accuracy on a
    distorted sequence at the undistorted baseline (<1% ATE, <1 deg)."""
    from sfm_mvs_tpu.models.incremental import IncrementalSfM

    imgs, Rt_gt, K, _ = distorted_scene
    cfg = SfmConfig(
        fx=float(K[0, 0]), fy=float(K[1, 1]),
        cx=float(K[0, 2]), cy=float(K[1, 2]), downscale=1,
        k1=DIST[0], k2=DIST[1],
        frontend=FrontendConfig(
            max_features=1024, num_octaves=3, upsample_input=True,
            contrast_threshold=0.015, lowe_ratio=0.75,
        ),
        map=MapConfig(max_cameras=8, max_points=16384),
    )
    sfm = IncrementalSfM(cfg)
    state = sfm.run(imgs)
    assert int(np.asarray(state.cam_valid).sum()) == 5
    poses = np.asarray(state.poses)[np.asarray(state.cam_valid)]
    ate = evaluate.ate_rmse(poses, Rt_gt)
    assert ate < 0.05
    rot = evaluate.rotation_errors_deg(poses, Rt_gt)
    assert rot.max() < 1.0


def test_finalize_with_loop_closure_and_sweep_on_distorted_render(distorted_scene):
    """Finalize's loop-closure injection and densify sweep must inject
    UNDISTORTED pixel coordinates (advisor r4: _cam_feats stored raw
    features, so both paths biased the final BA on distorted input).
    With detection-time undistortion the full finalize path holds the
    undistorted-baseline accuracy and the sweep's added points survive
    the reprojection cull rather than being geometrically inconsistent."""
    from sfm_mvs_tpu.models.incremental import IncrementalSfM
    from sfm_mvs_tpu.utils.config import SweepConfig

    imgs, Rt_gt, K, _ = distorted_scene
    cfg = SfmConfig(
        fx=float(K[0, 0]), fy=float(K[1, 1]),
        cx=float(K[0, 2]), cy=float(K[1, 2]), downscale=1,
        k1=DIST[0], k2=DIST[1],
        frontend=FrontendConfig(
            max_features=1024, num_octaves=3, upsample_input=True,
            contrast_threshold=0.015, lowe_ratio=0.75,
        ),
        map=MapConfig(max_cameras=8, max_points=16384),
        loop_close_pairs=2,
        # Denser sweep budget: exercises redetect_for_sweep's detection-
        # time undistortion (raw redetected pixels would fail the gates).
        sweep=SweepConfig(
            enabled=True, grow_points=32768,
            max_features=2048, contrast_threshold=0.008,
        ),
    )
    sfm = IncrementalSfM(cfg)
    sfm.run(imgs)
    pts_before = int(np.asarray(sfm.state.map.point_valid).sum())
    state = sfm.finalize()
    assert int(np.asarray(state.cam_valid).sum()) == 5
    poses = np.asarray(state.poses)[np.asarray(state.cam_valid)]
    ate = evaluate.ate_rmse(poses, Rt_gt)
    assert ate < 0.05
    rot = evaluate.rotation_errors_deg(poses, Rt_gt)
    assert rot.max() < 1.0
    # The sweep densified with pinhole-consistent coordinates: its points
    # survived the finalize cull (raw-coordinate injection loses most of
    # them to the reprojection gate and drags the BA cost up).
    pts_after = int(np.asarray(state.point_valid).sum())
    assert pts_after > 1.5 * pts_before
    assert float(np.sqrt(sfm.finalize_info["final_cost"])) < 1.0  # rms px


def test_k1_recovery_from_unaware_pipeline(distorted_scene):
    """The quality-matrix distortion scenario (VERDICT r3 item 7): run
    the pipeline UNAWARE of the render's radial distortion, then the
    shared-intrinsics BA block recovers k1 (sign + magnitude within 50%)
    and improves both cost (>2x) and ATE.

    k2 is not asserted: at this FOV (corner r^2 ~ 0.25) the r^4 term is
    nearly collinear with r^2 + focal scale and is unidentifiable
    (measured: k1 -0.226 vs true -0.18; k2 absorbs the remainder)."""
    from sfm_mvs_tpu.models import ba
    from sfm_mvs_tpu.models.incremental import IncrementalSfM

    imgs, Rt_gt, K, _ = distorted_scene
    cfg = SfmConfig(
        fx=float(K[0, 0]), fy=float(K[1, 1]),
        cx=float(K[0, 2]), cy=float(K[1, 2]), downscale=1,
        frontend=FrontendConfig(
            max_features=1024, num_octaves=3, upsample_input=True,
            contrast_threshold=0.015, lowe_ratio=0.75,
        ),
        map=MapConfig(max_cameras=8, max_points=16384),
    )
    sfm = IncrementalSfM(cfg)  # k1=k2=0: distortion NOT modeled
    state = sfm.run(imgs)
    assert int(np.asarray(state.cam_valid).sum()) == 5
    ate0 = evaluate.ate_rmse(
        np.asarray(state.poses)[np.asarray(state.cam_valid)], Rt_gt
    )
    st2, stats, intr = ba.bundle_adjust_map_intrinsics(
        state, max_iterations=40, cg_iters=30
    )
    _, k1, _ = [float(x) for x in intr]
    assert k1 < 0, "recovered k1 must match the barrel-distortion sign"
    assert abs(k1 - DIST[0]) < 0.5 * abs(DIST[0])
    assert float(stats.final_cost) < 0.5 * float(stats.initial_cost)
    ate1 = evaluate.ate_rmse(
        np.asarray(st2.poses)[np.asarray(st2.cam_valid)], Rt_gt
    )
    assert ate1 < ate0


def test_mvs_sweep_with_distortion(distorted_scene):
    """Plane sweep on RAW distorted images with dist passed: depth stays
    within 3% median relative error (rays undistorted, projections
    re-distorted inside the warp)."""
    from sfm_mvs_tpu.models import mvs

    imgs, Rt, K, depths_gt = distorted_scene
    dm = mvs.plane_sweep_depth(
        jnp.asarray(imgs[2]),
        jnp.stack([jnp.asarray(imgs[1]), jnp.asarray(imgs[3])]),
        jnp.asarray(Rt[2]),
        jnp.asarray(Rt[[1, 3]]),
        jnp.asarray(K),
        jnp.asarray(5.0), jnp.asarray(12.0),
        num_depths=96,
        dist=jnp.asarray(DIST, jnp.float32),
    )
    d = np.asarray(dm.depth)
    v = np.asarray(dm.valid)
    gt = depths_gt[2]
    mask = v & (gt > 0)
    assert mask.mean() > 0.2
    rel = np.abs(d[mask] - gt[mask]) / gt[mask]
    assert np.median(rel) < 0.03
