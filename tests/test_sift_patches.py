"""Pallas window-extraction kernel (interpreted on CPU; runs on TPU)."""

import numpy as np

import jax.numpy as jnp

from sfm_mvs_tpu.ops import sift_patches


def test_extract_windows_matches_slices(rng):
    maps = jnp.asarray(rng.random((4, 128, 512)).astype(np.float32))
    K = 8
    ch = jnp.asarray(rng.integers(0, 4, K).astype(np.int32))
    rb = jnp.asarray(rng.integers(0, (128 - 96) // 32 + 1, K).astype(np.int32))
    cb = jnp.asarray(rng.integers(0, (512 - 384) // 128 + 1, K).astype(np.int32))
    out = sift_patches.extract_windows(maps, ch, rb, cb)
    assert out.shape == (K, 96, 384)
    for k in range(K):
        r0 = int(rb[k]) * 32
        c0 = int(cb[k]) * 128
        ref = np.asarray(maps)[int(ch[k]), r0 : r0 + 96, c0 : c0 + 384]
        np.testing.assert_array_equal(np.asarray(out[k]), ref)


def test_window_origin_blocks_margins(rng):
    H, W = 640, 896
    xy = jnp.asarray(rng.uniform(0, [W - 1, H - 1], (64, 2)).astype(np.float32))
    rb, cb, off = sift_patches.window_origin_blocks(xy, H, W)
    rb = np.asarray(rb)
    cb = np.asarray(cb)
    off = np.asarray(off)
    assert (rb >= 0).all() and (rb * 32 + 96 <= H).all()
    assert (cb >= 0).all() and (cb * 128 + 384 <= W).all()
    # interior keypoints keep at least a block of margin on every side
    interior = (
        (np.asarray(xy)[:, 1] > 96) & (np.asarray(xy)[:, 1] < H - 96)
        & (np.asarray(xy)[:, 0] > 384) & (np.asarray(xy)[:, 0] < W - 384)
    )
    assert (off[interior, 1] >= 32).all() and (off[interior, 1] < 96).all()
    assert (off[interior, 0] >= 128).all() and (off[interior, 0] < 384).all()
