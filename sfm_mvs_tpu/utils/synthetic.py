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


def render_splat_sequence(
    num_cameras: int = 8,
    num_points: int = 3000,
    image_size=(320, 240),
    focal: float = 400.0,
    radius: float = 6.0,
    arc_degrees: float = 60.0,
    seed: int = 0,
    splat_sigma: float = 1.6,
):
    """Render a 3D Gaussian-splat point cloud from a camera ring.

    Each world point becomes a small Gaussian blob whose screen size scales
    with inverse depth — a genuinely 3D scene (no planar degeneracy for the
    8-point solver) with well-localized, scale-varying blob features that a
    DoG detector finds reliably. Returns (images, Scene).
    """
    scene = make_scene(
        num_points=num_points,
        num_cameras=num_cameras,
        radius=radius,
        arc_degrees=arc_degrees,
        seed=seed,
        image_size=image_size,
        focal=focal,
    )
    rng = np.random.default_rng(seed + 99)
    amp = 0.35 + 0.65 * rng.random(num_points).astype(np.float32)
    sizes = 0.7 + 0.8 * rng.random(num_points).astype(np.float32)
    W, H = image_size
    ref_depth = radius
    images = []
    for c in range(num_cameras):
        uv, depth = scene.project(c)
        img = np.zeros((H, W), dtype=np.float32)
        sig = splat_sigma * sizes * (ref_depth / np.maximum(depth, 0.5))
        r = np.maximum((3.0 * sig).astype(int), 1)
        vis = (depth > 0.5) & (uv[:, 0] > -20) & (uv[:, 0] < W + 20) & (
            uv[:, 1] > -20
        ) & (uv[:, 1] < H + 20)
        order = np.argsort(-depth)  # far first; near splats overwrite via max
        for p in order:
            if not vis[p]:
                continue
            cx, cy = uv[p]
            rr = int(r[p])
            x0, x1 = int(np.floor(cx)) - rr, int(np.floor(cx)) + rr + 1
            y0, y1 = int(np.floor(cy)) - rr, int(np.floor(cy)) + rr + 1
            x0c, x1c = max(x0, 0), min(x1, W)
            y0c, y1c = max(y0, 0), min(y1, H)
            if x0c >= x1c or y0c >= y1c:
                continue
            xs = np.arange(x0c, x1c) - cx
            ys = np.arange(y0c, y1c) - cy
            g = amp[p] * np.exp(
                -(xs[None, :] ** 2 + ys[:, None] ** 2) / (2.0 * sig[p] ** 2)
            )
            img[y0c:y1c, x0c:x1c] = np.maximum(img[y0c:y1c, x0c:x1c], g)
        images.append(np.clip(img, 0.0, 1.0) + 0.05)
    return images, scene


def estimate_lookat_target(Rt: np.ndarray) -> np.ndarray:
    """Least-squares point closest to every camera's optical axis."""
    A = np.zeros((3, 3))
    b = np.zeros(3)
    for pose in np.asarray(Rt, np.float64):
        R = pose[:, :3]
        C = -R.T @ pose[:, 3]
        d = R.T @ np.array([0.0, 0.0, 1.0])
        P = np.eye(3) - np.outer(d, d)
        A += P
        b += P @ C
    return np.linalg.solve(A, b)


def make_texture3d(
    size: int = 256, seed: int = 0, octaves: int = 6, decay: float = 1.0
) -> np.ndarray:
    """Multi-octave 3D value-noise volume in [0,1] (solid texture).

    decay: per-octave amplitude factor. The classic fBm 0.5 leaves the
    high-frequency octaves at ~3% contrast after normalization — too flat
    for a DoG detector (measured: 25 features/frame at 968x648 vs ~900 at
    decay 1.0). Flat spectra are right here: the texture's only job is to
    carry dense, distinctive detail on the surface."""
    rng = np.random.default_rng(seed)
    tex = np.zeros((size, size, size), dtype=np.float32)
    for o in range(octaves):
        n = 4 << o
        coarse = rng.random((n, n, n)).astype(np.float32)
        idx = np.linspace(0, n - 1, size)
        i0 = np.floor(idx).astype(int)
        i1 = np.minimum(i0 + 1, n - 1)
        f = (idx - i0).astype(np.float32)
        # trilinear upsample, one axis at a time
        up = coarse
        for ax in range(3):
            a0 = np.take(up, i0, axis=ax)
            a1 = np.take(up, i1, axis=ax)
            shape = [1, 1, 1]
            shape[ax] = size
            up = a0 + (a1 - a0) * f.reshape(shape)
        tex += up * (decay ** o)
    tex -= tex.min()
    tex /= tex.max()
    return tex


def _tex3_sample(tex: np.ndarray, p: np.ndarray, scale: float) -> np.ndarray:
    """Trilinear sample of the solid texture at world points p (..., 3)."""
    n = tex.shape[0]
    q = (p * scale) % (n - 1)
    i0 = np.floor(q).astype(int)
    f = (q - i0).astype(np.float32)
    i1 = np.minimum(i0 + 1, n - 1)
    c = 0.0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w = (
                    (f[..., 0] if dx else 1 - f[..., 0])
                    * (f[..., 1] if dy else 1 - f[..., 1])
                    * (f[..., 2] if dz else 1 - f[..., 2])
                )
                c = c + w * tex[
                    (i1 if dx else i0)[..., 0],
                    (i1 if dy else i0)[..., 1],
                    (i1 if dz else i0)[..., 2],
                ]
    return c


def render_object_from_poses(
    Rt: np.ndarray,
    K: np.ndarray,
    image_size=(968, 648),
    target: "np.ndarray | None" = None,
    seed: int = 0,
    # World-units -> texture-voxel scale. At 32 the finest noise octave
    # is ~0.06 world units (~8 px at the reference's depth/focal) and the
    # 255-voxel volume spans the ~7.5-unit object without wrapping (the
    # sample point is offset to keep coordinates strictly inside).
    tex_scale: float = 32.0,
    return_depth: bool = False,
):
    """Raytrace a solid-textured 3D "statue" from ARBITRARY camera poses.

    The trajectory-replay harness (SURVEY §7 parity item 2): the Gustav
    images are unshipped, so the closest achievable parity check renders
    a synthetic scene FROM the reference's own recovered trajectory
    (/root/reference/pose.csv — hand-held full-orbit dynamics: 360 deg of
    azimuth, elevation to ~63 deg) and verifies the pipeline re-recovers
    it. The object is a union of spheres (statue-ish silhouette) whose
    surface carries multi-octave 3D value noise — occlusion-correct and
    view-consistent from EVERY azimuth/elevation, unlike the staircase
    strips (edge-on beyond ~+-85 deg) or a splat cloud (near-identical
    blob descriptors fail the ratio test).

    Rt: (C, 3, 4) world->camera; K: (3, 3); target defaults to the
    least-squares closest point to all optical axes (where the statue
    stood). Returns (images, sphere list [(center, radius)]).
    """
    Rt = np.asarray(Rt, np.float64)
    K = np.asarray(K, np.float64)
    if target is None:
        target = estimate_lookat_target(Rt)
    tex = make_texture3d(seed=seed)
    # Snowman-ish union of spheres along the world-y axis through target.
    spheres = [
        (target + np.array([0.0, -1.6, 0.0]), 2.1),
        (target + np.array([0.0, 0.8, 0.0]), 1.6),
        (target + np.array([0.3, 2.3, 0.2]), 1.0),
    ]
    W, H = image_size
    Kinv = np.linalg.inv(K)
    u, v = np.meshgrid(
        np.arange(W, dtype=np.float64), np.arange(H, dtype=np.float64)
    )
    pix = np.stack([u, v, np.ones_like(u)], axis=-1)
    images, depths = [], []
    for pose in Rt:
        R = pose[:, :3]
        t = pose[:, 3]
        origin = -R.T @ t
        dirs = (pix @ Kinv.T) @ R  # unnormalized: camera z of dir == 1
        best_t = np.full((H, W), np.inf)
        for c, r in spheres:
            oc = origin - c
            # |oc + t d|^2 = r^2 with a = |d|^2
            a = np.sum(dirs * dirs, axis=-1)
            b = 2.0 * (dirs @ oc)
            cc = float(oc @ oc - r * r)
            disc = b * b - 4.0 * a * cc
            ok = disc > 0
            sq = np.sqrt(np.maximum(disc, 0.0))
            t0 = (-b - sq) / (2.0 * a)
            t0 = np.where(ok & (t0 > 0.1), t0, np.inf)
            best_t = np.minimum(best_t, t0)
        hit = origin[None, None, :] + best_t[..., None] * dirs
        hit_safe = np.where(np.isfinite(best_t[..., None]), hit, 0.0)
        # Sample relative to target, offset positive so the volume never
        # wraps on-object (extent ~[-3.7, 3.3] -> [0.3, 7.3] x 32 < 255).
        val = np.where(
            np.isfinite(best_t),
            _tex3_sample(
                tex, hit_safe - target[None, None, :] + 4.0, tex_scale
            ),
            0.12,
        ).astype(np.float32)
        images.append(val)
        depths.append(
            np.where(np.isfinite(best_t), best_t, 0.0).astype(np.float32)
        )
    if return_depth:
        return images, spheres, depths
    return images, spheres


def load_reference_trajectory(pose_csv: str):
    """Load the reference's pose.csv (K + C projection matrices, one value
    per line — sfm.py:423) into (K (3,3), Rt (C, 3, 4) with orthonormal R).
    """
    vals = np.loadtxt(pose_csv)
    K = vals[:9].reshape(3, 3)
    Ps = vals[9:].reshape(-1, 3, 4)
    Rts = np.linalg.inv(K) @ Ps
    out = []
    for Rt in Rts:
        U, _, Vt = np.linalg.svd(Rt[:, :3])
        R = U @ Vt
        if np.linalg.det(R) < 0:
            R = -R
        out.append(np.concatenate([R, Rt[:, 3:4]], axis=1))
    return K.astype(np.float32), np.stack(out).astype(np.float32)


def render_staircase_sequence(
    num_cameras: int = 8,
    image_size=(320, 240),
    focal: float = 400.0,
    radius: float = 8.0,
    arc_degrees: float = 40.0,
    num_strips: int = 8,
    depth_spread: float = 2.0,
    texture_size: int = 1024,
    seed: int = 0,
    return_depth: bool = False,
    texture: "np.ndarray | None" = None,
    dist: "tuple[float, float]" = (0.0, 0.0),
):
    """Render vertical textured strips at staggered depths (a "staircase").

    Rich noise texture (distinctive SIFT descriptors) combined with strong
    depth variation across strips — no dominant plane, so essential-matrix
    estimation is well-conditioned. This is the primary synthetic sequence
    for end-to-end pipeline tests and benchmarks. Returns (images,
    Rt (C,3,4), K (3,3)).

    texture: optional square (T, T) float image in [0, 1] to texture the
    strips with instead of the synthetic value noise — pass a real
    photograph (see :func:`load_image_texture`) to exercise the detector
    and matcher on real contrast/gradient statistics while keeping exact
    ground-truth geometry.
    """
    if texture is not None:
        tex = np.asarray(texture, np.float32)
        assert tex.ndim == 2 and tex.shape[0] == tex.shape[1], "square (T,T)"
        texture_size = tex.shape[0]
    else:
        tex = make_texture(texture_size, seed=seed)
    rng = np.random.default_rng(seed + 7)
    W, H = image_size
    K = np.array(
        [[focal, 0.0, W / 2.0], [0.0, focal, H / 2.0], [0.0, 0.0, 1.0]],
        dtype=np.float32,
    )
    s = 6.0  # scene width/height
    strip_w = s / num_strips
    depths = (rng.random(num_strips) - 0.5) * 2.0 * depth_spread  # z offsets
    ex = np.array([1.0, 0, 0])
    ey = np.array([0, 1.0, 0])
    ez = np.array([0, 0, 1.0])
    angles = np.deg2rad(np.linspace(-arc_degrees / 2, arc_degrees / 2, num_cameras))
    Rts, images, depth_maps = [], [], []
    Kinv = np.linalg.inv(K)
    u, v = np.meshgrid(np.arange(W, dtype=np.float64), np.arange(H, dtype=np.float64))
    pix = np.stack([u, v, np.ones_like(u)], axis=-1)
    if dist[0] != 0.0 or dist[1] != 0.0:
        # Output pixels are coordinates in the DISTORTED image: invert the
        # radial model x_d = x (1 + k1 r^2 + k2 r^4) by fixed point to get
        # the ideal ray each distorted pixel observes (matches
        # projection.undistort_normalized).
        xy_d = (pix @ Kinv.T)[..., :2]
        xy = xy_d.copy()
        for _ in range(8):
            r2 = np.sum(xy * xy, axis=-1, keepdims=True)
            f = 1.0 + dist[0] * r2 + dist[1] * r2 * r2
            xy = xy_d / np.maximum(np.abs(f), 1e-12) * np.sign(f)
        pix = np.concatenate([xy, np.ones_like(xy[..., :1])], axis=-1)
        Kinv = np.eye(3)  # pix already holds normalized ideal rays
    for a in angles:
        eye = np.array([radius * np.sin(a), -0.4 * np.sin(2 * a), -radius * np.cos(a)])
        Rt = look_at(eye, np.zeros(3))
        Rts.append(Rt)
        R = Rt[:, :3].astype(np.float64)
        t = Rt[:, 3].astype(np.float64)
        origin = -R.T @ t
        dirs = (pix @ Kinv.T) @ R
        img = np.full((H, W), 0.12, dtype=np.float32)
        best_t = np.full((H, W), np.inf)
        for i in range(num_strips):
            x_lo = -s / 2 + i * strip_w
            p0 = np.array([0.0, 0.0, depths[i]])
            n = ez
            dn = dirs @ n
            tt = np.where(np.abs(dn) > 1e-9, ((p0 - origin) @ n) / dn, np.inf)
            hit = origin[None, None, :] + tt[..., None] * dirs
            pu = hit @ ex
            pv = hit @ ey
            ok = (
                (tt > 0.1)
                & (pu >= x_lo)
                & (pu < x_lo + strip_w)
                & (np.abs(pv) <= s / 2)
                & (tt < best_t)
            )
            tu = np.clip((pu / s + 0.5) * (texture_size - 1), 0, texture_size - 1)
            tv = np.clip((pv / s + 0.5) * (texture_size - 1), 0, texture_size - 1)
            i0 = np.floor(tv).astype(int)
            j0 = np.floor(tu).astype(int)
            i1 = np.minimum(i0 + 1, texture_size - 1)
            j1 = np.minimum(j0 + 1, texture_size - 1)
            fi = (tv - i0).astype(np.float32)
            fj = (tu - j0).astype(np.float32)
            val = (
                tex[i0, j0] * (1 - fi) * (1 - fj)
                + tex[i0, j1] * (1 - fi) * fj
                + tex[i1, j0] * fi * (1 - fj)
                + tex[i1, j1] * fi * fj
            )
            img = np.where(ok, val, img).astype(np.float32)
            best_t = np.where(ok, tt, best_t)
        images.append(img)
        # best_t is the camera-frame z depth: ray dirs come from K^-1 p,
        # whose camera z component is exactly 1.
        depth_maps.append(np.where(np.isfinite(best_t), best_t, 0.0).astype(np.float32))
    if return_depth:
        return images, np.stack(Rts).astype(np.float32), K, depth_maps
    return images, np.stack(Rts).astype(np.float32), K


def render_corner_sequence(
    num_cameras: int = 8,
    image_size=(320, 240),
    focal: float = 400.0,
    radius: float = 8.0,
    arc_degrees: float = 60.0,
    texture_size: int = 1024,
    seed: int = 0,
):
    """Render a 3-plane "corner" scene (floor + two walls) from a camera ring.

    Non-planar in aggregate, so the 8-point essential-matrix solver is
    non-degenerate (a single plane induces a homography and makes E
    ambiguous). Rendering is exact ray-plane intersection with bilinear
    texture sampling. Returns (images, Rt (C,3,4), K (3,3)).
    """
    tex = make_texture(texture_size, seed=seed)
    W, H = image_size
    K = np.array(
        [[focal, 0.0, W / 2.0], [0.0, focal, H / 2.0], [0.0, 0.0, 1.0]],
        dtype=np.float32,
    )
    s = 4.0  # plane half-extent
    # Planes: (origin, u_axis, v_axis, normal); corner opens toward -z.
    ex = np.array([1.0, 0, 0]); ey = np.array([0, 1.0, 0]); ez = np.array([0, 0, 1.0])
    planes = [
        (np.array([0.0, s / 2, 0.0]), ex, ez, ey),      # floor y=+s/2 (y down)
        (np.array([-s / 2, 0.0, 0.0]), ez, ey, ex),     # left wall x=-s/2
        (np.array([0.0, 0.0, s / 2]), ex, ey, ez),      # back wall z=+s/2
    ]
    # Texture regions per plane (thirds of the texture, so content differs).
    tex_off = [0, texture_size // 3, 2 * texture_size // 3]
    angles = np.deg2rad(np.linspace(-arc_degrees / 2, arc_degrees / 2, num_cameras))
    target = np.array([0.0, 0.0, 0.0])
    Rts, images = [], []
    Kinv = np.linalg.inv(K)
    u, v = np.meshgrid(np.arange(W, dtype=np.float64), np.arange(H, dtype=np.float64))
    pix = np.stack([u, v, np.ones_like(u)], axis=-1)  # (H, W, 3)
    for a in angles:
        eye = np.array([radius * np.sin(a), -0.8, -radius * np.cos(a)])
        Rt = look_at(eye, target)
        Rts.append(Rt)
        R = Rt[:, :3].astype(np.float64)
        t = Rt[:, 3].astype(np.float64)
        origin = -R.T @ t
        dirs = (pix @ Kinv.T) @ R  # (H, W, 3) world-frame ray directions
        best_t = np.full((H, W), np.inf)
        img = np.full((H, W), 0.12, dtype=np.float32)
        for pi, (p0, ua, va, n) in enumerate(planes):
            dn = dirs @ n
            tt = np.where(np.abs(dn) > 1e-9, ((p0 - origin) @ n) / dn, np.inf)
            hit = origin[None, None, :] + tt[..., None] * dirs
            pu = (hit - p0) @ ua
            pv = (hit - p0) @ va
            ok = (tt > 0.1) & (np.abs(pu) <= s / 2) & (np.abs(pv) <= s / 2) & (tt < best_t)
            # texture coords: use a third of the texture per plane
            tsz3 = texture_size // 3
            tu = np.clip((pu / s + 0.5) * (texture_size - 1), 0, texture_size - 1)
            tv = np.clip((pv / s + 0.5) * (tsz3 - 1) + tex_off[pi], 0, texture_size - 1)
            i0 = np.floor(tv).astype(int); j0 = np.floor(tu).astype(int)
            i1 = np.minimum(i0 + 1, texture_size - 1); j1 = np.minimum(j0 + 1, texture_size - 1)
            fi = (tv - i0).astype(np.float32); fj = (tu - j0).astype(np.float32)
            val = (
                tex[i0, j0] * (1 - fi) * (1 - fj)
                + tex[i0, j1] * (1 - fi) * fj
                + tex[i1, j0] * fi * (1 - fj)
                + tex[i1, j1] * fi * fj
            )
            img = np.where(ok, val, img).astype(np.float32)
            best_t = np.where(ok, tt, best_t)
        images.append(img)
    return images, np.stack(Rts).astype(np.float32), K


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


def load_image_texture(path: str, size: int = 1024) -> np.ndarray:
    """Load a real photograph as a square grayscale texture in [0, 1].

    Center-crops to square, then area-averages down to `size` (integer
    block mean when divisible, else strided nearest). Used to texture the
    synthetic renderers with REAL image statistics (contrast distribution,
    gradient structure) while keeping exact ground-truth geometry.
    """
    from sfm_mvs_tpu.native import decode_gray

    g = decode_gray(path)  # (H, W) float32 in [0, 1]
    H, W = g.shape
    side = min(H, W)
    y0 = (H - side) // 2
    x0 = (W - side) // 2
    g = g[y0 : y0 + side, x0 : x0 + side]
    if side >= size and side % size == 0:
        f = side // size
        g = g.reshape(size, f, size, f).mean(axis=(1, 3))
    else:
        idx = np.minimum((np.arange(size) * (side / size)).astype(int), side - 1)
        g = g[np.ix_(idx, idx)]
    g = g - g.min()
    rng = g.max()
    return (g / rng if rng > 0 else g).astype(np.float32)
