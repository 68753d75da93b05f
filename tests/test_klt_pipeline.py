"""KLT-tracking SfM variant: tracking-based registration vs ground truth."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from sfm_mvs_tpu.models.klt import KltSfM
from sfm_mvs_tpu.utils import evaluate
from sfm_mvs_tpu.utils.config import FrontendConfig, MapConfig, SfmConfig
from sfm_mvs_tpu.utils.synthetic import render_staircase_sequence


@pytest.fixture(scope="module")
def klt_run():
    imgs, Rt, K = render_staircase_sequence(
        num_cameras=6, arc_degrees=20, image_size=(320, 240)
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
    k = KltSfM(cfg, redetect_every=3)
    state = k.run(imgs)
    return k, state, Rt


def test_all_cameras_registered(klt_run):
    k, state, Rt = klt_run
    assert int(np.asarray(state.cam_valid).sum()) == 6
    assert int(state.num_points) > 150


def test_trajectory_accuracy(klt_run):
    k, state, Rt = klt_run
    poses = np.asarray(state.poses)[np.asarray(state.cam_valid)]
    assert evaluate.ate_rmse(poses, Rt) < 0.06  # <1% of scene scale ~8
    rot = evaluate.rotation_errors_deg(poses, Rt)
    assert rot.max() < 1.5


def test_tracking_survives_frames(klt_run):
    k, state, Rt = klt_run
    # tracking (not re-matching) must keep a healthy live set every frame
    for s in k.stats:
        assert s["tracked"] > 80
        assert s["pnp_inliers"] > 30
        assert s["reproj_error"] < 1.0  # reference target

    # replenishment after re-detection creates new points
    assert any(s["new_points"] > 20 for s in k.stats[1:])
