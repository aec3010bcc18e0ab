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


def test_on_device_preprocess_matches_host_paths():
    """XLA fused preprocessing == C++/numpy host paths (same bilinear
    half-pixel semantics)."""
    import jax
    import jax.numpy as jnp

    from image2text_tpu.ops.preprocess import resize_normalize_on_device

    rng = np.random.default_rng(2)
    images = rng.integers(0, 256, (2, 41, 67, 3), np.uint8)
    dev = np.asarray(jax.jit(
        lambda x: resize_normalize_on_device(x, 32))(jnp.asarray(images)))
    host = resize_normalize_batch(images, 32, FLICKR_MEAN, FLICKR_STD)
    np.testing.assert_allclose(dev, host, atol=1e-4, rtol=1e-4)


def test_upscale_and_identity_sizes():
    rng = np.random.default_rng(1)
    images = rng.integers(0, 256, (2, 16, 16, 3), np.uint8)
    for size in (16, 48):
        ours = resize_normalize_batch(images, size, FLICKR_MEAN, FLICKR_STD)
        ref = _numpy_ref(images, size, FLICKR_MEAN, FLICKR_STD)
        np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-5,
                                   err_msg=f"size={size}")
