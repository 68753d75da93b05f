import pytest
pytestmark = pytest.mark.slow
"""Re-observation merging: revisited points extend tracks, not duplicate."""

import numpy as np

from sfm_mvs_tpu.models import map_store
from sfm_mvs_tpu.models.incremental import IncrementalSfM
from sfm_mvs_tpu.utils.config import FrontendConfig, MapConfig, RansacConfig, SfmConfig
from sfm_mvs_tpu.utils.synthetic import render_staircase_sequence


def _run(merge: bool):
    # back-and-forth camera path: frames 4-5 revisit earlier viewpoints,
    # re-detecting points whose tracks broke at the turn.
    imgs, Rt, K = render_staircase_sequence(
        num_cameras=5, arc_degrees=16, image_size=(320, 240)
    )
    seq = [imgs[0], imgs[2], imgs[4], imgs[2], imgs[0]]
    cfg = SfmConfig(
        fx=float(K[0, 0]), fy=float(K[1, 1]), cx=float(K[0, 2]), cy=float(K[1, 2]),
        downscale=1,
        frontend=FrontendConfig(
            max_features=1024, num_octaves=3, upsample_input=True,
            contrast_threshold=0.015, lowe_ratio=0.75,
        ),
        ransac=RansacConfig(merge_reobservations=merge),
        map=MapConfig(max_cameras=8, max_points=16384),
    )
    sfm = IncrementalSfM(cfg)
    state = sfm.run(seq)
    return sfm, state


def test_merging_reduces_duplicates_and_extends_tracks():
    sfm_off, st_off = _run(False)
    sfm_on, st_on = _run(True)
    n_off = int(st_off.num_points)
    n_on = int(st_on.num_points)
    assert n_on < n_off  # duplicates avoided
    # mean track length (obs per point) increases
    obs_off = int(map_store.num_observations(st_off))
    obs_on = int(map_store.num_observations(st_on))
    tl_off = obs_off / max(n_off, 1)
    tl_on = obs_on / max(n_on, 1)
    assert tl_on > tl_off
    # both register all cameras
    assert int(np.asarray(st_on.cam_valid).sum()) == 5
    # reconstruction quality preserved
    assert all(s["reproj_error"] < 1.0 for s in sfm_on.stats)
