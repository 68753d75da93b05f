"""Native C++ host runtime: decode, pyr_down, PLY, prefetching loader.

Skipped when the toolchain is unavailable (pure-Python fallbacks are
exercised everywhere else).
"""

import numpy as np
import pytest

from sfm_mvs_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


@pytest.fixture(scope="module")
def png_path(tmp_path_factory):
    from PIL import Image

    rng = np.random.default_rng(0)
    img = (rng.random((60, 80, 3)) * 255).astype(np.uint8)
    p = tmp_path_factory.mktemp("imgs") / "a.png"
    Image.fromarray(img).save(p)
    return str(p), img


def test_decode_gray_matches_bt601(png_path):
    p, img = png_path
    g = native.decode_gray(p)
    ref = (0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]) / 255.0
    assert g.shape == (60, 80)
    np.testing.assert_allclose(g, ref, atol=1e-5)


def test_decode_bgr_channel_order(png_path):
    p, img = png_path
    b = native.decode_bgr(p)
    np.testing.assert_allclose(b[..., 0], img[..., 2], atol=1e-5)  # blue first
    np.testing.assert_allclose(b[..., 2], img[..., 0], atol=1e-5)


def test_decode_jpeg(tmp_path):
    from PIL import Image

    img = np.full((32, 48, 3), 128, dtype=np.uint8)
    p = tmp_path / "b.jpg"
    Image.fromarray(img).save(p, quality=95)
    g = native.decode_gray(str(p))
    assert g.shape == (32, 48)
    assert abs(float(g.mean()) - 128 / 255) < 0.02


def test_pyr_down_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(1)
    x = rng.random((63, 81)).astype(np.float32)  # odd sizes: ceil semantics
    ours = native.pyr_down(x)
    theirs = cv2.pyrDown(x)
    assert ours.shape == theirs.shape == (32, 41)
    np.testing.assert_allclose(
        ours[2:-2, 2:-2], theirs[2:-2, 2:-2], atol=2e-6
    )


def test_write_ply_matches_reference_semantics(tmp_path):
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    pts[0] = [100.0, 0, 0]  # outlier after x200 scale
    cols = (rng.random((500, 3)) * 255).astype(np.float32)
    n = native.write_ply(str(tmp_path / "a.ply"), pts, cols)
    lines = open(tmp_path / "a.ply").read().splitlines()
    assert lines[0] == "ply"
    assert f"element vertex {n}" in lines[2]
    assert n < 500  # outlier removed
    assert "property uchar blue" in lines[6]  # BGR order like the reference
    # binary variant round-trips the header
    nb = native.write_ply(str(tmp_path / "b.ply"), pts, cols, binary=True)
    assert nb == n
    head = open(tmp_path / "b.ply", "rb").read(60)
    assert b"binary_little_endian" in head


def test_image_loader_prefetch(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(3)
    paths = []
    for i in range(6):
        img = (rng.random((40, 50, 3)) * 255).astype(np.uint8)
        p = tmp_path / f"f{i}.png"
        Image.fromarray(img).save(p)
        paths.append(str(p))
    loader = native.ImageLoader(paths, downscale=2)
    for i in range(6):
        g, b = loader.get(i)
        assert g.shape == (20, 25)
        assert b.shape == (20, 25, 3)
    loader.close()
