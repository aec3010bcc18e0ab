"""Test-local torch replica of torchvision's VisionTransformer.

torchvision is not installed in this environment (zero egress), so the ViT
import-parity test uses this oracle: a pure-torch module with the EXACT
state-dict key layout and forward semantics of
``torchvision.models.vision_transformer.VisionTransformer`` (the backbone
the reference loads SWAG weights into, reference models/encoder.py:56-61).

Fidelity notes (checked against torchvision source):

* ``conv_proj``: Conv2d(3, hidden, kernel=stride=patch) → reshape
  (b, hidden, n) → permute (b, n, hidden);
* ``class_token`` (1, 1, hidden) prepended, expanded per batch;
* ``encoder.pos_embedding`` (1, seq, hidden) added, then dropout;
* each ``encoder.layers.encoder_layer_i`` is pre-LN:
  ``x + MHA(ln_1(x))`` then ``x + mlp(ln_2(x))`` where the attention is
  literally ``torch.nn.MultiheadAttention(batch_first=True)`` — the same
  module torchvision instantiates — and ``mlp`` is
  Sequential[Linear, GELU(exact), Dropout, Linear, Dropout] so parameters
  live at slots ``mlp.0`` / ``mlp.3``;
* ``encoder.ln`` final LayerNorm; all LayerNorms eps=1e-6;
* forward returns the pooled class token (``heads`` replaced by Identity,
  as the reference does at encoder.py:61).

When torchvision IS available the parity test runs against the real thing
instead; this file exists so the test never skips.
"""
from __future__ import annotations

from collections import OrderedDict
from functools import partial

import torch
from torch import nn


class _MLPBlock(nn.Sequential):
    def __init__(self, in_dim: int, mlp_dim: int, dropout: float = 0.0):
        super().__init__(
            nn.Linear(in_dim, mlp_dim),
            nn.GELU(),
            nn.Dropout(dropout),
            nn.Linear(mlp_dim, in_dim),
            nn.Dropout(dropout),
        )
        # torchvision MLPBlock init: xavier_uniform weights, normal(1e-6) bias
        for m in self.modules():
            if isinstance(m, nn.Linear):
                nn.init.xavier_uniform_(m.weight)
                nn.init.normal_(m.bias, std=1e-6)


class _EncoderBlock(nn.Module):
    def __init__(self, num_heads: int, hidden_dim: int, mlp_dim: int,
                 dropout: float = 0.0, attention_dropout: float = 0.0):
        super().__init__()
        norm = partial(nn.LayerNorm, eps=1e-6)
        self.ln_1 = norm(hidden_dim)
        self.self_attention = nn.MultiheadAttention(
            hidden_dim, num_heads, dropout=attention_dropout,
            batch_first=True)
        self.dropout = nn.Dropout(dropout)
        self.ln_2 = norm(hidden_dim)
        self.mlp = _MLPBlock(hidden_dim, mlp_dim, dropout)

    def forward(self, input):
        x = self.ln_1(input)
        x, _ = self.self_attention(x, x, x, need_weights=False)
        x = self.dropout(x)
        x = x + input
        y = self.mlp(self.ln_2(x))
        return x + y


class _Encoder(nn.Module):
    def __init__(self, seq_length: int, num_layers: int, num_heads: int,
                 hidden_dim: int, mlp_dim: int, dropout: float = 0.0):
        super().__init__()
        self.pos_embedding = nn.Parameter(
            torch.empty(1, seq_length, hidden_dim).normal_(std=0.02))
        self.dropout = nn.Dropout(dropout)
        layers = OrderedDict(
            (f"encoder_layer_{i}",
             _EncoderBlock(num_heads, hidden_dim, mlp_dim, dropout))
            for i in range(num_layers))
        self.layers = nn.Sequential(layers)
        self.ln = nn.LayerNorm(hidden_dim, eps=1e-6)

    def forward(self, input):
        input = input + self.pos_embedding
        return self.ln(self.layers(self.dropout(input)))


class VisionTransformerOracle(nn.Module):
    """torchvision.models.vision_transformer.VisionTransformer replica."""

    def __init__(self, image_size: int, patch_size: int, num_layers: int,
                 num_heads: int, hidden_dim: int, mlp_dim: int):
        super().__init__()
        self.patch_size = patch_size
        self.hidden_dim = hidden_dim
        self.conv_proj = nn.Conv2d(3, hidden_dim, kernel_size=patch_size,
                                   stride=patch_size)
        self.class_token = nn.Parameter(torch.zeros(1, 1, hidden_dim))
        seq_length = (image_size // patch_size) ** 2 + 1
        self.encoder = _Encoder(seq_length, num_layers, num_heads,
                                hidden_dim, mlp_dim)
        self.heads = nn.Identity()  # reference encoder.py:61
        # torchvision conv_proj init: trunc_normal on fan_in, zero bias —
        # any nonzero random init serves the parity test; keep default conv
        # init but randomize the class token so it participates
        nn.init.normal_(self.class_token, std=0.02)

    def forward(self, x):
        b = x.shape[0]
        x = self.conv_proj(x)
        x = x.reshape(b, self.hidden_dim, -1).permute(0, 2, 1)
        cls = self.class_token.expand(b, -1, -1)
        x = torch.cat([cls, x], dim=1)
        x = self.encoder(x)
        return self.heads(x[:, 0])
