"""ViT-B/16 backbone, torchvision-compatible.

A from-scratch JAX implementation of torchvision's VisionTransformer
(vit_b_16) with identical parameter tree naming, so SWAG/ImageNet
checkpoints exported from torchvision load directly via
``import_torchvision_vit_state_dict`` — the TPU analog of the reference's
``vit_b_16(weights=ViT_B_16_Weights.IMAGENET1K_SWAG_LINEAR_V1)`` backbone
(reference: models/encoder.py:56-61).

Output = the encoder's final-LN class-token feature (heads == Identity).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from image2text_tpu.nn.core import Ctx, Module, ModuleList, dropout, normal_init, zeros_init
from image2text_tpu.nn.modules import Conv2d, LayerNorm, Linear, MultiheadAttention
from image2text_tpu.utils.tree import flatten, unflatten


class _ViTMLPBlock(Module):
    """torchvision MLPBlock: Sequential[Linear, GELU, Dropout, Linear, Dropout].

    Parameterised slots are '0' and '3'; GELU is exact (not tanh) here,
    unlike the rest of the framework."""

    def __init__(self, dim: int, hidden: int, dropout_rate: float = 0.0):
        super().__init__()
        self.fc1 = self.add("0", Linear(dim, hidden))
        self.fc2 = self.add("3", Linear(hidden, dim))
        self.dropout_rate = dropout_rate

    def forward(self, p, x, ctx: Ctx = Ctx(), **kwargs):
        h = jax.nn.gelu(self.fc1(p["0"], x), approximate=False)
        h, ctx = dropout(h, self.dropout_rate, ctx)
        h = self.fc2(p["3"], h)
        h, ctx = dropout(h, self.dropout_rate, ctx)
        return h


class _ViTEncoderBlock(Module):
    def __init__(self, dim: int, num_heads: int, mlp_dim: int,
                 dropout_rate: float = 0.0, attn_dropout: float = 0.0):
        super().__init__()
        self.ln_1 = self.add("ln_1", LayerNorm(dim, bias=True, eps=1e-6))
        self.self_attention = self.add(
            "self_attention", MultiheadAttention(dim, num_heads, dropout=attn_dropout))
        self.ln_2 = self.add("ln_2", LayerNorm(dim, bias=True, eps=1e-6))
        self.mlp = self.add("mlp", _ViTMLPBlock(dim, mlp_dim, dropout_rate))
        self.dropout_rate = dropout_rate

    def forward(self, p, x, ctx: Ctx = Ctx(), **kwargs):
        h = self.ln_1(p["ln_1"], x)
        h = self.self_attention(p["self_attention"], h, h, h, ctx=ctx.fold(1))
        h, _ = dropout(h, self.dropout_rate, ctx.fold(2))
        x = x + h
        y = self.mlp(p["mlp"], self.ln_2(p["ln_2"], x), ctx=ctx.fold(3))
        return x + y


class _ViTEncoder(Module):
    def __init__(self, seq_length: int, num_layers: int, dim: int,
                 num_heads: int, mlp_dim: int, dropout_rate: float = 0.0):
        super().__init__()
        self.param("pos_embedding", (1, seq_length, dim), normal_init(std=0.02))
        layers = Module()
        self.blocks = []
        for i in range(num_layers):
            blk = _ViTEncoderBlock(dim, num_heads, mlp_dim, dropout_rate)
            layers.add(f"encoder_layer_{i}", blk)
            self.blocks.append(blk)
        self.layers = self.add("layers", layers)
        self.ln = self.add("ln", LayerNorm(dim, bias=True, eps=1e-6))
        self.dropout_rate = dropout_rate

    def forward(self, p, x, ctx: Ctx = Ctx(), **kwargs):
        x = x + p["pos_embedding"].astype(x.dtype)
        x, ctx = dropout(x, self.dropout_rate, ctx)
        for i, blk in enumerate(self.blocks):
            x = blk(p["layers"][f"encoder_layer_{i}"], x, ctx=ctx.fold(10 + i))
        return self.ln(p["ln"], x)


class VisionTransformerB16(Module):
    """ViT-B/16: 12 layers, 768 dim, 12 heads, MLP 3072, 16x16 patches.

    Forward expects NCHW float images of ``image_size``² and returns the
    pooled class-token feature (b, 768)."""

    def __init__(self, image_size: int = 224, patch_size: int = 16,
                 num_layers: int = 12, num_heads: int = 12,
                 hidden_dim: int = 768, mlp_dim: int = 3072):
        super().__init__()
        self.image_size = image_size
        self.patch_size = patch_size
        self.hidden_dim = hidden_dim
        self.n_patches = (image_size // patch_size) ** 2
        self.conv_proj = self.add("conv_proj", Conv2d(
            3, hidden_dim, (patch_size, patch_size), padding="VALID",
            stride=(patch_size, patch_size)))
        self.param("class_token", (1, 1, hidden_dim), zeros_init())
        self.encoder = self.add("encoder", _ViTEncoder(
            self.n_patches + 1, num_layers, hidden_dim, num_heads, mlp_dim))

    def forward(self, p, images, ctx: Ctx = Ctx(), **kwargs):
        b = images.shape[0]
        # conv with stride == kernel == patch size
        x = self.conv_proj(p["conv_proj"], images)
        x = x.reshape(b, self.hidden_dim, -1).transpose(0, 2, 1)  # (b, hw, d)
        cls = jnp.broadcast_to(p["class_token"].astype(x.dtype),
                               (b, 1, self.hidden_dim))
        x = jnp.concatenate([cls, x], axis=1)
        x = self.encoder(p["encoder"], x, ctx=ctx)
        return x[:, 0]  # pooled class token; heads == Identity


def import_torchvision_vit_state_dict(params: Dict, sd: Dict[str, np.ndarray]) -> Dict:
    """Load a torchvision vit_b_16 ``state_dict`` (numpy-valued) into our
    parameter tree.  Names map 1:1; ``heads.*`` keys are ignored (the
    reference replaces heads with Identity, encoder.py:61)."""
    flat = flatten(params)
    for key, value in sd.items():
        if key.startswith("heads."):
            continue
        if key not in flat:
            raise KeyError(f"unexpected torchvision ViT key: {key}")
        value = np.asarray(value)
        if flat[key].shape != value.shape:
            raise ValueError(f"shape mismatch for {key}: "
                             f"{flat[key].shape} vs {value.shape}")
        flat[key] = jnp.asarray(value)
    return unflatten(flat)
