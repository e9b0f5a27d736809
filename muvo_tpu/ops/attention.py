"""Multi-head attention: fused XLA path + Pallas flash-attention for TPU.

The fusion transformer sees ~324 tokens at the default config (stride-32
DecoderDS tokens; reference mile.py:546-557) and ~5.2k tokens in LARGE mode.
For short sequences the einsum path is already MXU-bound under XLA fusion;
for long sequences we dispatch to the Pallas flash kernel
(muvo_tpu/ops/flash_attention.py) which tiles KV with an online softmax and
never materialises the (N, N) score matrix in HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


_FLASH_MIN_TOKENS = 2048


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def multi_head_attention(q, k, v, n_heads: int, use_flash: bool | None = None,
                         seq_len: int | None = None):
    """Batched MHA. q, k, v: (B, N, C) with C divisible by n_heads.

    Returns (B, N, C). Scaling 1/sqrt(head_dim), no masking (the fusion
    transformer is fully bidirectional).

    seq_len: true token count when N is pre-padded to a flash block
    multiple (pad-once-through-the-stack; see flash_attention.padded_len).
    Keys beyond seq_len are masked exactly; pad-row outputs are junk the
    caller slices off.
    """
    b, n, c = q.shape
    hd = c // n_heads

    qh = q.reshape(b, n, n_heads, hd)
    kh = k.reshape(b, n, n_heads, hd)
    vh = v.reshape(b, n, n_heads, hd)

    if use_flash is None:
        use_flash = n >= _FLASH_MIN_TOKENS and _on_tpu()
    if use_flash:
        from muvo_tpu.ops.flash_attention import flash_attention

        out = flash_attention(
            qh.transpose(0, 2, 1, 3), kh.transpose(0, 2, 1, 3),
            vh.transpose(0, 2, 1, 3), seq_len=seq_len,
        ).transpose(0, 2, 1, 3)
        return out.reshape(b, n, c)

    scale = 1.0 / jnp.sqrt(jnp.float32(hd))
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32) * scale
    if seq_len is not None and seq_len < n:
        mask = jnp.arange(n) < seq_len
        logits = jnp.where(mask[None, None, None, :], logits, -1e30)
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights, vh)
    return out.reshape(b, n, c)
