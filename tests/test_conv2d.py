"""Conv primitives vs the exact OpenCV/scipy operations the reference uses."""

import cv2
import numpy as np
from scipy import signal

from xsarsea_tpu.ops.conv2d import (
    B2_KERNEL,
    B4_KERNEL,
    B42_KERNEL,
    coarsen2_mean,
    conv2d_same,
    local_mean,
    r2_reduce,
    resize_area,
    scharr,
    smooth_b2,
)

rng = np.random.default_rng(0)
IMG = rng.uniform(0.01, 1.0, size=(37, 53))


def test_conv2d_same_symm_matches_scipy():
    for k in (B2_KERNEL, B4_KERNEL, B42_KERNEL):
        got = np.asarray(conv2d_same(IMG, k, boundary="symm"))
        expected = signal.convolve2d(IMG, k, mode="same", boundary="symm")
        np.testing.assert_allclose(got, expected, rtol=1e-12, atol=1e-14)


def test_conv2d_same_even_kernels_match_scipy():
    """Even kernel dims take the k//2-before pad split (review finding:
    the swapped split shifted every output by one row/col)."""
    for shape in [(4, 4), (2, 3), (4, 5), (5, 4), (2, 2)]:
        k = rng.normal(size=shape)
        got = np.asarray(conv2d_same(IMG, k, boundary="symm"))
        expected = signal.convolve2d(IMG, k, mode="same", boundary="symm")
        np.testing.assert_allclose(got, expected, rtol=1e-12, atol=1e-12)


def test_resize_area_integer_dtype():
    """Integer images must not truncate the fractional area weights to
    0/1 (review finding); result equals the float computation."""
    img_u16 = (IMG * 1000).astype(np.uint16)
    got = np.asarray(resize_area(img_u16, (18, 26)))
    expected = np.asarray(resize_area(img_u16.astype(np.float32), (18, 26)))
    np.testing.assert_allclose(got, expected, rtol=1e-6)
    assert got.max() > 1.0  # not the zeroed-out integer matmul


def test_conv2d_complex():
    z = IMG + 1j * IMG[::-1]
    got = np.asarray(conv2d_same(z, B2_KERNEL, boundary="symm"))
    expected = signal.convolve2d(z, B2_KERNEL, mode="same", boundary="symm")
    np.testing.assert_allclose(got, expected, rtol=1e-12)


def test_scharr_matches_cv2():
    gx = np.asarray(scharr(IMG, axis=1))
    gy = np.asarray(scharr(IMG, axis=0))
    np.testing.assert_allclose(gx, cv2.Scharr(IMG, cv2.CV_64F, 1, 0), rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(gy, cv2.Scharr(IMG, cv2.CV_64F, 0, 1), rtol=1e-12, atol=1e-12)


def _r2_reference(image):
    """R2 exactly as the reference computes it (gradients.py:689-721)."""
    B2 = B2_KERNEL
    B4 = signal.convolve(B2, B2)
    _image = signal.convolve2d(image, B4, mode="same", boundary="symm")
    num = signal.convolve2d(np.ones_like(_image), B4, mode="same", boundary="symm")
    image = _image / num
    h, w = (image.shape[0] // 2) * 2, (image.shape[1] // 2) * 2
    image = image[:h, :w].reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    _image = signal.convolve2d(image, B2, mode="same", boundary="symm")
    num = signal.convolve2d(np.ones_like(_image), B2, mode="same", boundary="symm")
    return _image / num


def test_r2_matches_reference_formula():
    got = np.asarray(r2_reduce(IMG))
    np.testing.assert_allclose(got, _r2_reference(IMG), rtol=1e-12, atol=1e-14)
    # odd sizes trim
    got_odd = np.asarray(r2_reduce(IMG[:35, :51]))
    np.testing.assert_allclose(got_odd, _r2_reference(IMG[:35, :51]), rtol=1e-12, atol=1e-14)


def test_local_mean_matches_reference_formula():
    from scipy import signal as sig

    B4 = sig.convolve(B2_KERNEL, B2_KERNEL)
    x = sig.convolve2d(IMG, B4, mode="same", boundary="symm")
    expected = sig.convolve2d(x, B42_KERNEL, mode="same", boundary="symm")
    got = np.asarray(local_mean(IMG))
    np.testing.assert_allclose(got, expected, rtol=1e-12, atol=1e-14)


def test_resize_area_matches_cv2():
    for factor in (2, 3):
        target = (IMG.shape[0] // factor, IMG.shape[1] // factor)
        got = np.asarray(resize_area(IMG, target))
        expected = cv2.resize(IMG, (target[1], target[0]), interpolation=cv2.INTER_AREA)
        # cv2 computes INTER_AREA weights at reduced internal precision
        np.testing.assert_allclose(got, expected, atol=5e-8)


def test_coarsen2():
    got = np.asarray(coarsen2_mean(np.arange(30.0).reshape(5, 6)))
    assert got.shape == (2, 3)
    np.testing.assert_allclose(got[0, 0], np.mean([0, 1, 6, 7]))


def test_smooth_b2():
    got = np.asarray(smooth_b2(IMG))
    expected = signal.convolve2d(IMG, B2_KERNEL, mode="same", boundary="symm")
    np.testing.assert_allclose(got, expected, rtol=1e-12)
