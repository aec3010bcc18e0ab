"""Fused on-device image preprocessing.

The serving/benchmark path ships raw uint8 HWC batches to the device and
runs decode-adjacent preprocessing (u8→f32 scale, bilinear resize with
half-pixel centers, per-channel normalize, HWC→CHW) as XLA ops fused into
the same program as the encoder — the north-star's "fused preprocessing"
replacing host-side torchvision transforms (reference trainer.py:69-73).
Numerics match the C++ host path (native/preproc.cc) and the numpy
reference; see tests/test_native.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from image2text_tpu.training.data import FLICKR_MEAN, FLICKR_STD


def resize_normalize_on_device(images_u8: jax.Array, size: int,
                               mean=None, std=None,
                               out_dtype=jnp.float32) -> jax.Array:
    """(b, h, w, c) uint8 → (b, c, size, size) ``out_dtype``, inside jit."""
    mean = jnp.asarray(FLICKR_MEAN if mean is None else mean, jnp.float32)
    std = jnp.asarray(FLICKR_STD if std is None else std, jnp.float32)
    b, h, w, c = images_u8.shape
    x = images_u8.astype(jnp.float32) / 255.0
    # antialias=False: torchvision's tensor Resize is plain bilinear with
    # half-pixel centers (reference trainer.py:71); jax.image antialiases
    # downscales by default
    x = jax.image.resize(x, (b, size, size, c), method="linear",
                         antialias=False)
    x = (x - mean) / std
    return x.transpose(0, 3, 1, 2).astype(out_dtype)
