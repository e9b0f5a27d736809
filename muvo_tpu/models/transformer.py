"""Multimodal token-fusion transformer (post-LN, torch-compatible).

Replicates the semantics of the reference's ``nn.TransformerEncoder`` stack
(reference: muvo/models/mile.py:96-101): 6 post-LN layers, 8 heads, ReLU FFN
of width 2048, dropout 0.1. Parameters are laid out so a torch state dict
(in_proj_weight / out_proj / linear1 / linear2 / norm1 / norm2) converts
directly.

Attention runs through ``muvo_tpu.ops.attention.multi_head_attention`` which
dispatches to a Pallas flash-attention kernel on TPU for long token counts and
a fused XLA einsum path otherwise.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from muvo_tpu.ops.attention import multi_head_attention


class TransformerEncoderLayer(nn.Module):
    d_model: int
    n_heads: int = 8
    dim_feedforward: int = 2048
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, N, C)
        qkv = nn.Dense(3 * self.d_model, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        attn = multi_head_attention(q, k, v, self.n_heads)
        attn = nn.Dense(self.d_model, name="out_proj")(attn)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + attn)

        ff = nn.relu(nn.Dense(self.dim_feedforward, name="linear1")(x))
        ff = nn.Dropout(self.dropout, deterministic=not train)(ff)
        ff = nn.Dense(self.d_model, name="linear2")(ff)
        ff = nn.Dropout(self.dropout, deterministic=not train)(ff)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(x + ff)


class TransformerEncoder(nn.Module):
    d_model: int
    n_layers: int = 6
    n_heads: int = 8
    dim_feedforward: int = 2048
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.n_layers):
            x = TransformerEncoderLayer(
                self.d_model, self.n_heads, self.dim_feedforward, self.dropout,
                name=f"layer{i}",
            )(x, train)
        return x
