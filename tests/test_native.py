"""C++ preprocessing core vs the numpy reference implementation."""
import numpy as np
import pytest

from image2text_tpu.native import get_lib, resize_normalize_batch
from image2text_tpu.training.data import (FLICKR_MEAN, FLICKR_STD,
                                          _resize_bilinear)


def _numpy_ref(images, size, mean, std):
    out = np.stack([_resize_bilinear(im, size) for im in images]) / 255.0
    return ((out - mean[None, :, None, None]) / std[None, :, None, None]
            ).astype(np.float32)


def test_native_lib_builds():
    assert get_lib() is not None, "g++ build of native/preproc.cc failed"


def test_resize_normalize_matches_numpy():
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (3, 57, 83, 3), np.uint8)
    ours = resize_normalize_batch(images, 32, FLICKR_MEAN, FLICKR_STD)
    ref = _numpy_ref(images, 32, FLICKR_MEAN, FLICKR_STD)
    assert ours.shape == (3, 3, 32, 32)
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-5)


def test_upscale_and_identity_sizes():
    rng = np.random.default_rng(1)
    images = rng.integers(0, 256, (2, 16, 16, 3), np.uint8)
    for size in (16, 48):
        ours = resize_normalize_batch(images, size, FLICKR_MEAN, FLICKR_STD)
        ref = _numpy_ref(images, size, FLICKR_MEAN, FLICKR_STD)
        np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-5,
                                   err_msg=f"size={size}")
