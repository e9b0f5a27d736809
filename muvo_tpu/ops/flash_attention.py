"""Pallas TPU flash-attention (non-causal, bidirectional).

Online-softmax tiling over the KV sequence: for each Q block the kernel walks
KV blocks keeping running max/sum statistics in VMEM scratch, so the (N, N)
score matrix never touches HBM. Head dim is zero-padded to the 128-lane width
and ragged sequence lengths are handled with an in-kernel key-validity mask.

Forward-only custom kernel with an XLA-recompute VJP: at the fusion
transformer's sequence lengths (<= ~5.2k tokens, reference mile.py:546-557)
the backward recompute is cheap and XLA fuses it well.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_Q = 256
_BLOCK_K = 256
_LANE = 128
_NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *,
                  scale, seq_len, block_k):
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (block_q, block_k)

    # Mask keys beyond the true sequence length (zero-padded tail).
    col = kv_idx * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < seq_len, s, _NEG_INF)

    m_prev = m_ref[...]
    l_prev = l_ref[...]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next)
    l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)

    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[...] = m_next
    l_ref[...] = l_next

    @pl.when(kv_idx == pl.num_programs(2) - 1)
    def _finalize():
        o_ref[0] = (acc_ref[...] / l_ref[...]).astype(o_ref.dtype)


def _flash_fwd(q, k, v, block_q, block_k):
    bh, n, d = q.shape  # batch*heads fused into dim 0
    scale = 1.0 / (d ** 0.5)

    d_pad = max(_LANE, ((d + _LANE - 1) // _LANE) * _LANE)
    nq_pad = ((n + block_q - 1) // block_q) * block_q
    nk_pad = ((n + block_k - 1) // block_k) * block_k

    def pad(x, n_to):
        return jnp.pad(x, ((0, 0), (0, n_to - n), (0, d_pad - d)))

    qp, kp, vp = pad(q, nq_pad), pad(k, nk_pad), pad(v, nk_pad)
    grid = (bh, nq_pad // block_q, nk_pad // block_k)

    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, seq_len=n, block_k=block_k),
        out_shape=jax.ShapeDtypeStruct((bh, nq_pad, d_pad), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, d_pad), lambda b, i, j: (b, i, 0)),
                pl.BlockSpec((1, block_k, d_pad), lambda b, i, j: (b, j, 0)),
                pl.BlockSpec((1, block_k, d_pad), lambda b, i, j: (b, j, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, d_pad), lambda b, i, j: (b, i, 0)),
            scratch_shapes=[
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, d_pad), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=jax.default_backend() == "cpu",  # CPU tests run interpreted
    )(qp, kp, vp)
    return out[:, :n, :d]


def _reference_attention(q, k, v):
    d = q.shape[-1]
    s = jnp.einsum("bqd,bkd->bqk", q, k, preferred_element_type=jnp.float32)
    w = jax.nn.softmax(s / (d ** 0.5), axis=-1).astype(v.dtype)
    return jnp.einsum("bqk,bkd->bqd", w, v)


@jax.custom_vjp
def _flash(q, k, v):
    bh = q.shape[0] * q.shape[1]
    qf = q.reshape((bh,) + q.shape[2:])
    kf = k.reshape((bh,) + k.shape[2:])
    vf = v.reshape((bh,) + v.shape[2:])
    n = qf.shape[1]
    bq = min(_BLOCK_Q, ((n + 127) // 128) * 128)
    bk = min(_BLOCK_K, ((n + 127) // 128) * 128)
    return _flash_fwd(qf, kf, vf, bq, bk).reshape(q.shape)


def _flash_vjp_fwd(q, k, v):
    return _flash(q, k, v), (q, k, v)


def _flash_vjp_bwd(res, g):
    q, k, v = res

    def ref(q, k, v):
        bh = q.shape[0] * q.shape[1]
        out = _reference_attention(
            q.reshape((bh,) + q.shape[2:]),
            k.reshape((bh,) + k.shape[2:]),
            v.reshape((bh,) + v.shape[2:]),
        )
        return out.reshape(q.shape)

    _, vjp = jax.vjp(ref, q, k, v)
    return vjp(g)


_flash.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


def flash_attention(q, k, v):
    """q, k, v: (B, H, N, D) -> (B, H, N, D)."""
    assert q.shape == k.shape == v.shape
    return _flash(q, k, v)
