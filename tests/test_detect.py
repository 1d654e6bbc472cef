"""NumPy detector-pipeline tests (io/detect): the corner -> descriptor ->
ratio-test matcher that feeds the real-image homography demo
(example_multi_homography.ipynb cell 2's SIFT+BF stage, VERDICT r3
missing #2). Pure NumPy — no device programs."""

import numpy as np

from progressivex_tpu.io.detect import (
    harris_keypoints,
    match_descriptors,
    patch_descriptors,
)


def _textured_image(rng, h=240, w=320, n_blobs=120):
    """Random smooth blob texture: enough corner structure to detect."""
    img = np.zeros((h, w), np.float32)
    ys = rng.uniform(20, h - 20, n_blobs)
    xs = rng.uniform(20, w - 20, n_blobs)
    amp = rng.uniform(40, 200, n_blobs)
    yy, xx = np.mgrid[0:h, 0:w]
    for y, x, a in zip(ys, xs, amp):
        img += a * np.exp(-((yy - y) ** 2 + (xx - x) ** 2) / (2 * 3.0**2))
    return np.clip(img, 0, 255)


def test_matching_recovers_known_translation():
    rng = np.random.default_rng(0)
    im1 = _textured_image(rng)
    dy, dx = 7, -12
    im2 = np.roll(np.roll(im1, dy, axis=0), dx, axis=1)
    k1 = harris_keypoints(im1, n_max=400)
    k2 = harris_keypoints(im2, n_max=400)
    assert len(k1) > 50 and len(k2) > 50
    m = match_descriptors(patch_descriptors(im1, k1),
                          patch_descriptors(im2, k2))
    assert len(m) >= 30, f"only {len(m)} matches"
    disp = k2[m[:, 1]] - k1[m[:, 0]]
    good = (np.abs(disp - [dx, dy]) <= 1.0).all(axis=1)
    # Ratio + cross-check should leave an overwhelmingly correct set.
    assert good.mean() >= 0.8, f"only {good.mean():.2f} correct"


def test_match_descriptors_empty():
    z = np.zeros((0, 128), np.float32)
    d = np.ones((5, 128), np.float32)
    assert match_descriptors(z, d).shape == (0, 2)
    assert match_descriptors(d, z).shape == (0, 2)


def test_descriptors_unit_norm_and_border_safe():
    rng = np.random.default_rng(1)
    img = _textured_image(rng)
    kps = np.array([[0.0, 0.0], [5.0, 5.0], [160.0, 120.0],
                    [319.0, 239.0]])
    d = patch_descriptors(img, kps)
    assert d.shape == (4, 128)
    n = np.linalg.norm(d, axis=1)
    # Keypoints whose patch leaves the image yield zero descriptors (no
    # crash); interior ones are unit-norm.
    np.testing.assert_allclose(n[2], 1.0, atol=1e-5)
    assert n[0] == 0.0 and n[1] == 0.0 and n[3] == 0.0
