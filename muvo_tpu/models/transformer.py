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

# Flatten the row-local ops to (B*N, C) only at token counts where the
# rank-3 dot's batch-in-sublanes lowering is the dominant cost (the LARGE
# stride-8 path); matches the flash-attention dispatch threshold.
_FLATTEN_MIN_TOKENS = 2048


class TransformerEncoderLayer(nn.Module):
    d_model: int
    n_heads: int = 8
    dim_feedforward: int = 2048
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False,
                 seq_len: Optional[int] = None):
        # x: (B, N, C); seq_len = true token count when N is pre-padded to
        # a flash block multiple (pad-once-through-the-stack).
        #
        # At LARGE token counts, every Dense/LN/residual here is row-local,
        # so the layer runs on a flattened (B*N, C) view and restores
        # (B, N, C) only for the attention: XLA lowers a rank-3
        # (B, N, K)·(K, M) dot through a batch-in-sublanes convolution
        # emitter at ~17% MFU (measured on the 5,184-token LARGE step:
        # linear2 alone 67 ms/step), while the equivalent flattened 2-D
        # GEMM uses the native dot emitter. At the flagship's 648 tokens
        # the flatten measured a net LOSS (~+2 ms/step backward — the
        # reshape boundaries cost more than the emitter gap at small N),
        # so it is gated on the token count.
        b, n, c = x.shape
        flat = n >= _FLATTEN_MIN_TOKENS
        if flat:
            x = x.reshape(b * n, c)
        qkv = nn.Dense(3 * self.d_model, name="in_proj")(x)
        q, k, v = jnp.split(qkv.reshape(b, n, 3 * self.d_model), 3, axis=-1)
        attn = multi_head_attention(q, k, v, self.n_heads, seq_len=seq_len)
        if flat:
            attn = attn.reshape(b * n, self.d_model)
        attn = nn.Dense(self.d_model, name="out_proj")(attn)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + attn)

        ff = nn.relu(nn.Dense(self.dim_feedforward, name="linear1")(x))
        ff = nn.Dropout(self.dropout, deterministic=not train)(ff)
        ff = nn.Dense(self.d_model, name="linear2")(ff)
        ff = nn.Dropout(self.dropout, deterministic=not train)(ff)
        out = nn.LayerNorm(epsilon=1e-5, name="norm2")(x + ff)
        return out.reshape(b, n, c) if flat else out


class TransformerEncoder(nn.Module):
    d_model: int
    n_layers: int = 6
    n_heads: int = 8
    dim_feedforward: int = 2048
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False,
                 seq_len: Optional[int] = None):
        for i in range(self.n_layers):
            x = TransformerEncoderLayer(
                self.d_model, self.n_heads, self.dim_feedforward, self.dropout,
                name=f"layer{i}",
            )(x, train, seq_len=seq_len)
        return x
