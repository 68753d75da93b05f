"""End-to-end incremental SfM on a rendered sequence vs ground truth."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from sfm_mvs_tpu.models.incremental import IncrementalSfM
from sfm_mvs_tpu.utils import evaluate, io
from sfm_mvs_tpu.utils.config import FrontendConfig, MapConfig, SfmConfig
from sfm_mvs_tpu.utils.synthetic import render_staircase_sequence


@pytest.fixture(scope="module")
def reconstruction():
    imgs, Rt_gt, K = render_staircase_sequence(
        num_cameras=5, arc_degrees=24, image_size=(320, 240)
    )
    cfg = SfmConfig(
        fx=float(K[0, 0]), fy=float(K[1, 1]), cx=float(K[0, 2]), cy=float(K[1, 2]),
        downscale=1,
        frontend=FrontendConfig(
            max_features=1024, num_octaves=3, upsample_input=True,
            contrast_threshold=0.015, lowe_ratio=0.75,
        ),
        map=MapConfig(max_cameras=8, max_points=16384),
    )
    sfm = IncrementalSfM(cfg)
    state = sfm.run(imgs)
    return sfm, state, Rt_gt


def test_all_cameras_registered(reconstruction):
    sfm, state, Rt_gt = reconstruction
    from sfm_mvs_tpu.models import map_store

    assert int(np.asarray(state.cam_valid).sum()) == 5
    assert int(state.num_points) > 100
    assert int(map_store.num_observations(state)) > 2 * int(state.num_points)


def test_trajectory_matches_ground_truth(reconstruction):
    sfm, state, Rt_gt = reconstruction
    poses = np.asarray(state.poses)[np.asarray(state.cam_valid)]
    ate = evaluate.ate_rmse(poses, Rt_gt)
    assert ate < 0.05  # scene scale ~6 -> <1% error
    rot = evaluate.rotation_errors_deg(poses, Rt_gt)
    assert rot.max() < 1.0


def test_reprojection_error_below_reference_target(reconstruction):
    """Reference target: 'Ideally it should be less than one' px (sfm.py:321)."""
    sfm, state, Rt_gt = reconstruction
    for s in sfm.stats:
        assert s["reproj_error"] < 1.0


def test_observation_grid_consistency(reconstruction):
    sfm, state, Rt_gt = reconstruction
    mask = np.asarray(state.obs_mask)
    pv = np.asarray(state.point_valid)
    n_cams = int(state.num_cams)
    # observations only in valid cameras and valid points
    assert not mask[:, n_cams:].any()
    assert not mask[~pv].any()
    # every valid point observed by >= 2 cameras (triangulated + seen)
    assert (mask[pv].sum(axis=1) >= 2).all()


def test_points_near_ground_truth_planes(reconstruction):
    """Triangulated points should lie on the staircase strips (|y|<=3, z in
    the strip depth range) after similarity alignment via cameras."""
    sfm, state, Rt_gt = reconstruction
    poses = np.asarray(state.poses)[np.asarray(state.cam_valid)]
    est_c = evaluate.camera_centers(poses)
    gt_c = evaluate.camera_centers(Rt_gt)
    s, R, t = evaluate.umeyama_alignment(est_c, gt_c)
    pts = np.asarray(state.points)[np.asarray(state.point_valid)]
    aligned = pts @ (s * R).T + t
    # strips: |x|,|y| <= 3, z in [-2, 2] (depth_spread default 2.0)
    inside = (
        (np.abs(aligned[:, 0]) < 3.5)
        & (np.abs(aligned[:, 1]) < 3.5)
        & (np.abs(aligned[:, 2]) < 2.5)
    )
    assert inside.mean() > 0.95


def test_ply_and_pose_export(tmp_path, reconstruction):
    sfm, state, Rt_gt = reconstruction
    n = io.map_to_ply(str(tmp_path / "sparse.ply"), state)
    assert n > 100
    txt = (tmp_path / "sparse.ply").read_text().splitlines()
    assert txt[0] == "ply"
    assert txt[2] == f"element vertex {n}"
    io.map_pose_csv(str(tmp_path / "pose.csv"), state)
    vals = np.loadtxt(tmp_path / "pose.csv")
    assert len(vals) == 9 + 5 * 12  # K + five 3x4 projection matrices


def test_ply_round_trip(tmp_path, reconstruction):
    """read_ply inverts to_ply (same points after x200 scale, BGR order)."""
    sfm, state, Rt_gt = reconstruction
    n = io.map_to_ply(str(tmp_path / "rt.ply"), state)
    pts, cols = io.read_ply(str(tmp_path / "rt.ply"))
    assert pts.shape == (n, 3) and cols.shape == (n, 3)
    valid = np.asarray(state.point_valid)
    raw = np.asarray(state.points)[valid] * 200.0
    mean = raw.mean(axis=0)
    keep = np.linalg.norm(raw - mean, axis=1) < np.linalg.norm(
        raw - mean, axis=1
    ).mean() + 300.0
    np.testing.assert_allclose(pts, raw[keep], atol=1e-3)
    assert cols.min() >= 0 and cols.max() <= 255


def test_finalize_improves_map(reconstruction):
    """Cull + final global BA drops cost and keeps the trajectory."""
    from sfm_mvs_tpu.models import ba as ba_mod
    from sfm_mvs_tpu.models.refine import finalize_map

    sfm, state, Rt_gt = reconstruction
    cost_before = float(ba_mod._cost(ba_mod.problem_from_map(state)))
    new_state, info = finalize_map(state, max_iterations=10, cull_px=4.0)
    cost_after = float(ba_mod._cost(ba_mod.problem_from_map(new_state)))
    assert cost_after < cost_before
    assert info["points"] > 50
    # every surviving point still has >= 2 observations
    tl = np.asarray(new_state.obs_mask).sum(axis=1)
    pv = np.asarray(new_state.point_valid)
    assert (tl[pv] >= 2).all()
    poses = np.asarray(new_state.poses)[np.asarray(new_state.cam_valid)]
    assert evaluate.ate_rmse(poses, Rt_gt) < 0.05


@pytest.mark.parametrize("seed", [11, 23])
def test_pipeline_robust_across_textures(seed):
    """Different texture seeds (different scenes) must all reconstruct."""
    imgs, Rt_gt, K = render_staircase_sequence(
        num_cameras=4, arc_degrees=20, image_size=(320, 240), seed=seed
    )
    cfg = SfmConfig(
        fx=float(K[0, 0]), fy=float(K[1, 1]), cx=float(K[0, 2]), cy=float(K[1, 2]),
        downscale=1,
        frontend=FrontendConfig(
            max_features=1024, num_octaves=3, upsample_input=True,
            contrast_threshold=0.015, lowe_ratio=0.75,
        ),
        map=MapConfig(max_cameras=8, max_points=16384),
    )
    sfm = IncrementalSfM(cfg)
    state = sfm.run(imgs)
    poses = np.asarray(state.poses)[np.asarray(state.cam_valid)]
    assert len(poses) == 4
    assert evaluate.ate_rmse(poses, Rt_gt) < 0.08


def test_planar_scene_bootstrap_via_model_selection():
    """A near-planar scene must NOT bend the trajectory: the bootstrap's
    H/E model selection routes it through homography decomposition."""
    imgs, Rt_gt, K = render_staircase_sequence(
        num_cameras=4, arc_degrees=20, depth_spread=0.5, image_size=(320, 240)
    )
    cfg = SfmConfig(
        fx=float(K[0, 0]), fy=float(K[1, 1]), cx=float(K[0, 2]), cy=float(K[1, 2]),
        downscale=1,
        frontend=FrontendConfig(
            max_features=1024, num_octaves=3, upsample_input=True,
            contrast_threshold=0.015, lowe_ratio=0.75,
        ),
        map=MapConfig(max_cameras=8, max_points=16384),
    )
    sfm = IncrementalSfM(cfg)
    state = sfm.run(imgs)
    # near-planar incremental registration drifts without optimization;
    # the recommended config runs BA — apply the final polish as the
    # quality matrix does.
    from sfm_mvs_tpu.models.refine import finalize_map

    state, _ = finalize_map(state, max_iterations=10)
    poses = np.asarray(state.poses)[np.asarray(state.cam_valid)]
    assert len(poses) == 4
    rot = evaluate.rotation_errors_deg(poses, Rt_gt)
    assert rot.max() < 1.0  # was ~13 deg with E-only bootstrap
