"""Host-side IO: image loading, PLY export, pose.csv export.

Byte-level output semantics follow the reference so artifacts can be
diffed against it: `to_ply` scales the cloud x200, drops points beyond
mean-centroid-distance + 300, and writes ASCII PLY with blue,green,red
uchar properties (sfm.py:169-201); pose.csv is one value per line,
[K.ravel(), P0.ravel(), P1.ravel(), ...] (sfm.py:276,334-335,423).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

from sfm_mvs_tpu.models.map_store import MapState

_PLY_HEADER = """ply
format ascii 1.0
element vertex {n}
property float x
property float y
property float z
property uchar blue
property uchar green
property uchar red
end_header
"""


def load_image_gray(path: str, downscale: int = 1) -> np.ndarray:
    """Decode an image file to (H, W) float32 grayscale in [0, 1].

    Replacement for cv2.imread+cvtColor (sfm.py:301,243): the native C++
    decoder (native/sfm_native.cc) when built, PIL otherwise.
    """
    from sfm_mvs_tpu import native

    if native.available():
        return native.decode_gray(path)
    from PIL import Image

    img = np.asarray(Image.open(path).convert("L"), dtype=np.float32) / 255.0
    return img


def load_image_bgr(path: str) -> np.ndarray:
    """Decode to (H, W, 3) float32 BGR in [0, 255] (reference color order)."""
    from sfm_mvs_tpu import native

    if native.available():
        return native.decode_bgr(path)
    from PIL import Image

    rgb = np.asarray(Image.open(path).convert("RGB"), dtype=np.float32)
    return rgb[..., ::-1]


def list_images(img_dir: str) -> list[str]:
    """Sorted .jpg/.png listing (sfm.py:288-292)."""
    out = []
    for name in sorted(os.listdir(img_dir)):
        if ".jpg" in name.lower() or ".png" in name.lower():
            out.append(os.path.join(img_dir, name))
    return out


def to_ply(
    path: str,
    points: np.ndarray,
    colors: np.ndarray,
    scale: float = 200.0,
    outlier_offset: float = 300.0,
) -> int:
    """Write an ASCII PLY with the reference's cleaning semantics.

    points: (N, 3); colors: (N, 3) BGR in [0, 255]. Returns #vertices kept.
    Cleaning: scale x`scale`, drop points farther than mean centroid
    distance + `outlier_offset` (sfm.py:170-181).
    """
    from sfm_mvs_tpu import native

    if native.available():
        return native.write_ply(
            path, np.asarray(points), np.asarray(colors),
            scale=scale, outlier_offset=outlier_offset,
        )
    pts = points.reshape(-1, 3) * scale
    cols = colors.reshape(-1, 3)
    mean = pts.mean(axis=0)
    dist = np.linalg.norm(pts - mean, axis=1)
    keep = dist < dist.mean() + outlier_offset
    verts = np.hstack([pts[keep], cols[keep]])
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write(_PLY_HEADER.format(n=len(verts)))
        np.savetxt(f, verts, "%f %f %f %d %d %d")
    return int(keep.sum())


def read_ply(path: str):
    """Read an ASCII PLY written by `to_ply` back to (points, colors_bgr).

    Honors the header's property order, so files that declare blue,green,
    red (the reference's order, sfm.py:186-195) come back as BGR and
    plain red,green,blue files come back converted to BGR too.
    """
    with open(path) as f:
        props = []
        n = 0
        in_vertex = False
        for line in f:
            tok = line.split()
            if tok[:1] == ["element"]:
                # Only the vertex element's SCALAR properties are columns;
                # 'property list ...' (face indices etc., standard in
                # external PLYs) is variable-length, not a column
                # (advisor r3).
                in_vertex = tok[1:2] == ["vertex"]
                if in_vertex:
                    n = int(tok[2])
            elif tok[:2] == ["property", "list"]:
                continue
            elif tok[:1] == ["property"] and in_vertex:
                props.append(tok[2])
            elif tok[:1] == ["end_header"]:
                break
        if n == 0 or not props:
            return np.zeros((0, 3), np.float32), None
        data = np.loadtxt(f, dtype=np.float64, max_rows=n)
    data = data.reshape(n, len(props))
    idx = {p: i for i, p in enumerate(props)}
    pts = data[:, [idx["x"], idx["y"], idx["z"]]].astype(np.float32)
    if "blue" in idx:
        cols = data[:, [idx["blue"], idx["green"], idx["red"]]].astype(np.float32)
    else:
        cols = None
    return pts, cols


def map_to_ply(path: str, state: MapState, scale: float = 200.0, outlier_offset: float = 300.0) -> int:
    """Export a MapState's valid points as PLY."""
    valid = np.asarray(state.point_valid)
    pts = np.asarray(state.points)[valid]
    cols = np.asarray(state.colors)[valid]
    return to_ply(path, pts, cols, scale=scale, outlier_offset=outlier_offset)


def save_pose_csv(path: str, K: np.ndarray, poses: Sequence[np.ndarray]) -> None:
    """pose.csv: [K.ravel(), (K @ pose_i).ravel()...] one value per line.

    The reference stores projection matrices P = K [R|t] (sfm.py:317,365),
    starting with K itself (sfm.py:276).
    """
    arr = np.asarray(K, dtype=np.float64).ravel()
    for pose in poses:
        P = np.asarray(K, np.float64) @ np.asarray(pose, np.float64)
        arr = np.hstack([arr, P.ravel()])
    np.savetxt(path, arr, delimiter="\n")


def load_pose_csv(path: str):
    """Parse a pose.csv written by this framework or by the reference.

    Layout (sfm.py:276,423): flat [K(9), P_0(12), P_1(12), ...], one value
    per line. Returns (K (3,3), P (N,3,4) projection matrices).
    """
    vals = np.loadtxt(path)
    K = vals[:9].reshape(3, 3)
    rest = vals[9:]
    n = len(rest) // 12
    P = rest[: n * 12].reshape(n, 3, 4)
    return K, P


def poses_from_projections(K: np.ndarray, P: np.ndarray) -> np.ndarray:
    """Recover [R|t] extrinsics from P = K [R|t] (for trajectory metrics)."""
    Kinv = np.linalg.inv(K)
    return np.einsum("ij,njk->nik", Kinv, P)


def map_pose_csv(path: str, state: MapState) -> None:
    valid = np.asarray(state.cam_valid)
    poses = [p for p, v in zip(np.asarray(state.poses), valid) if v]
    save_pose_csv(path, np.asarray(state.K), poses)
