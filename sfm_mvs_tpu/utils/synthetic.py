"""Synthetic scene + image generation for tests and benchmarks.

The reference is validated only by eyeballing its Gustav reconstruction
(SURVEY.md §4: no tests exist). We instead generate scenes with known
ground-truth geometry — cameras orbiting a textured 3D structure — so every
kernel can be unit-tested against closed-form truth, and the full pipeline
can be benchmarked end-to-end at the reference's resolution without needing
the (unshipped) Gustav dataset.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class Scene:
    """Ground-truth scene: world points + camera ring.

    points: (P, 3) float32 world points.
    Rt:     (C, 3, 4) world->camera extrinsics.
    K:      (3, 3) shared intrinsics.
    """

    points: np.ndarray
    Rt: np.ndarray
    K: np.ndarray

    def project(self, cam: int):
        """Project all points into camera `cam`. Returns (uv (P,2), depth (P,))."""
        Rt = self.Rt[cam]
        Xc = self.points @ Rt[:3, :3].T + Rt[:3, 3]
        uv = Xc @ self.K.T
        return uv[:, :2] / uv[:, 2:3], Xc[:, 2]


def look_at(eye: np.ndarray, target: np.ndarray, up=None) -> np.ndarray:
    """World->camera [R|t] looking from eye toward target (+z forward)."""
    if up is None:
        up = np.array([0.0, -1.0, 0.0])
    z = target - eye
    z = z / np.linalg.norm(z)
    x = np.cross(z, up)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z])  # rows are camera axes in world coords
    t = -R @ eye
    return np.concatenate([R, t[:, None]], axis=1).astype(np.float32)


def make_scene(
    num_points: int = 2000,
    num_cameras: int = 8,
    radius: float = 6.0,
    arc_degrees: float = 120.0,
    seed: int = 0,
    image_size=(968, 648),
    focal: float = 1200.0,
) -> Scene:
    """Camera ring orbiting a blob of 3D points (statue-like geometry)."""
    rng = np.random.default_rng(seed)
    pts = rng.normal(scale=1.0, size=(num_points, 3)).astype(np.float32)
    pts[:, 1] *= 2.0  # elongate vertically, like the statue
    W, H = image_size
    K = np.array(
        [[focal, 0.0, W / 2.0], [0.0, focal, H / 2.0], [0.0, 0.0, 1.0]],
        dtype=np.float32,
    )
    angles = np.deg2rad(np.linspace(0.0, arc_degrees, num_cameras))
    Rts = []
    for a in angles:
        eye = np.array([radius * np.sin(a), 0.3, -radius * np.cos(a)])
        Rts.append(look_at(eye, np.zeros(3)))
    return Scene(points=pts, Rt=np.stack(Rts), K=K)


def make_texture(size: int = 1024, seed: int = 0, octaves: int = 5) -> np.ndarray:
    """Multi-octave value-noise texture in [0,1], rich in corners/blobs."""
    rng = np.random.default_rng(seed)
    tex = np.zeros((size, size), dtype=np.float32)
    for o in range(octaves):
        n = 8 << o
        coarse = rng.random((n, n)).astype(np.float32)
        # bilinear upsample to full size
        idx = np.linspace(0, n - 1, size)
        i0 = np.floor(idx).astype(int)
        i1 = np.minimum(i0 + 1, n - 1)
        f = (idx - i0).astype(np.float32)
        up = (
            coarse[np.ix_(i0, i0)] * np.outer(1 - f, 1 - f)
            + coarse[np.ix_(i0, i1)] * np.outer(1 - f, f)
            + coarse[np.ix_(i1, i0)] * np.outer(f, 1 - f)
            + coarse[np.ix_(i1, i1)] * np.outer(f, f)
        )
        tex += up / (1 << o)
    tex -= tex.min()
    tex /= tex.max()
    return tex


def render_plane_sequence(
    num_cameras: int = 8,
    image_size=(320, 240),
    focal: float = 400.0,
    plane_size: float = 4.0,
    radius: float = 6.0,
    arc_degrees: float = 60.0,
    texture_size: int = 1024,
    seed: int = 0,
):
    """Render a textured 3D plane (z=0, |x|,|y|<=s/2) from a camera ring.

    Returns (images: list[(H,W) float32 in [0,1]], Rt: (C,3,4), K: (3,3)).
    Rendering is exact inverse-homography bilinear sampling, so SIFT-style
    features are realistically detectable and matchable across views and the
    recovered geometry can be compared to the ground-truth poses.
    """
    tex = make_texture(texture_size, seed=seed)
    W, H = image_size
    K = np.array(
        [[focal, 0.0, W / 2.0], [0.0, focal, H / 2.0], [0.0, 0.0, 1.0]],
        dtype=np.float32,
    )
    angles = np.deg2rad(np.linspace(0.0, arc_degrees, num_cameras))
    Rts, images = [], []
    # Plane param: world (x, y, 0) with x,y in [-s/2, s/2] -> texture coords.
    s = plane_size
    for a in angles:
        eye = np.array([radius * np.sin(a), 0.2 * np.sin(3 * a), -radius * np.cos(a)])
        Rt = look_at(eye, np.zeros(3))
        Rts.append(Rt)
        # Homography from image pixels to plane coords: for plane z=0,
        # x_img ~ K [r1 r2 t] [X Y 1]^T  =>  plane->image H, invert.
        Hpi = K @ np.stack([Rt[:, 0], Rt[:, 1], Rt[:, 3]], axis=1)
        Hip = np.linalg.inv(Hpi)
        u, v = np.meshgrid(np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32))
        ones = np.ones_like(u)
        pix = np.stack([u, v, ones], axis=-1) @ Hip.T
        X = pix[..., 0] / pix[..., 2]
        Y = pix[..., 1] / pix[..., 2]
        # plane coords -> texture pixel coords
        tu = (X / s + 0.5) * (texture_size - 1)
        tv = (Y / s + 0.5) * (texture_size - 1)
        inside = (tu >= 0) & (tu <= texture_size - 1) & (tv >= 0) & (tv <= texture_size - 1)
        tu = np.clip(tu, 0, texture_size - 1)
        tv = np.clip(tv, 0, texture_size - 1)
        i0 = np.floor(tv).astype(int)
        j0 = np.floor(tu).astype(int)
        i1 = np.minimum(i0 + 1, texture_size - 1)
        j1 = np.minimum(j0 + 1, texture_size - 1)
        fi = (tv - i0).astype(np.float32)
        fj = (tu - j0).astype(np.float32)
        img = (
            tex[i0, j0] * (1 - fi) * (1 - fj)
            + tex[i0, j1] * (1 - fi) * fj
            + tex[i1, j0] * fi * (1 - fj)
            + tex[i1, j1] * fi * fj
        )
        img = np.where(inside, img, 0.12).astype(np.float32)
        images.append(img)
    return images, np.stack(Rts), K
