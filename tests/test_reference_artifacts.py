"""Oracle checks against the reference's shipped Gustav artifacts.

The reference ships pose.csv (K + 57 projection matrices from its Gustav
run) and sparse.ply (19,282 points). We verify our readers/writers are
format-compatible with those exact files (SURVEY.md §4 names them the
regression oracles) and that the recovered intrinsics match the hardcoded
K (sfm.py:16-23 after downscale).
"""

import os

import numpy as np
import pytest

from sfm_mvs_tpu.utils import evaluate, io

_POSE = "/root/reference/pose.csv"
_PLY = "/root/reference/Point_Cloud/sparse.ply"

pytestmark = pytest.mark.skipif(
    not os.path.exists(_POSE), reason="reference artifacts not available"
)


def test_parse_reference_pose_csv():
    K, P = io.load_pose_csv(_POSE)
    assert P.shape == (57, 3, 4)  # 57 registered Gustav cameras
    # K matches sfm.py:16-23 after downscale=2
    assert abs(K[0, 0] - 2393.952166119461 / 2) < 1e-6
    assert abs(K[1, 2] - 628.2649953288065 / 2) < 1e-6
    # recovered extrinsics: rotations approximately orthonormal
    Rt = io.poses_from_projections(K, P)
    R = Rt[:, :, :3]
    errs = np.abs(np.einsum("nij,nkj->nik", R, R) - np.eye(3)).max(axis=(1, 2))
    assert np.median(errs) < 0.2  # reference P matrices are not renormalized
    # camera centers form a finite trajectory
    centers = evaluate.camera_centers(Rt)
    assert np.isfinite(centers).all()


def test_roundtrip_our_pose_csv(tmp_path):
    K, P = io.load_pose_csv(_POSE)
    Rt = io.poses_from_projections(K, P)
    out = str(tmp_path / "pose.csv")
    io.save_pose_csv(out, K, list(Rt))
    K2, P2 = io.load_pose_csv(out)
    np.testing.assert_allclose(K2, K, rtol=1e-6)
    np.testing.assert_allclose(P2, P, rtol=1e-4, atol=1e-4)


def test_reference_sparse_ply_readable():
    header = open(_PLY).read(400).splitlines()
    assert header[0] == "ply"
    n = int([l for l in header if l.strip().startswith("element vertex")][0].split()[-1])
    assert n == 19282  # BASELINE.md cloud size
    # our writer produces the same property layout (blue,green,red uchar)
    props = [l.strip() for l in header if l.strip().startswith("property")]
    assert "property uchar blue" in props
