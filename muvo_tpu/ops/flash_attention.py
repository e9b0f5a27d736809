"""Pallas TPU flash-attention (non-causal, bidirectional), fwd + bwd.

Online-softmax tiling over the KV sequence: for each Q block the forward
kernel walks KV blocks keeping running max/sum statistics in VMEM scratch,
so the (N, N) score matrix never touches HBM; it also emits the per-row
logsumexp. The backward is the standard FlashAttention-2 recompute scheme —
two kernels sharing the saved (q, k, v, o, lse) residuals:

  * dQ kernel: for each Q block, walk KV blocks; p = exp(qk^T·scale - lse),
    dp = dO v^T, ds = p (dp - D) · scale, dq += ds k, with
    D = rowsum(dO ⊙ O) precomputed in XLA.
  * dK/dV kernel: for each KV block, walk Q blocks; dv += p^T dO,
    dk += ds^T q.

All accumulation is fp32 in VMEM; the dense (N, N) score matrix never
materialises in either direction, so LARGE-mode (5,184 fusion tokens,
reference mile.py:31-32,546-557) batches are no longer pinned by an S²
buffer. Head dim is zero-padded to the 128-lane width and ragged sequence
lengths are handled with an in-kernel key-validity mask.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

# 512x512 blocks: larger MXU operands and 4x fewer online-softmax rescales
# than 256 (measured faster on v5e). Env-overridable for block sweeps.
def _block_env(name, default):
    val = int(_os.environ.get(name, default))
    if val < 128 or val % 128:
        raise ValueError(
            f"{name}={val}: flash block sizes must be multiples of 128 and "
            f">= 128 (the kernels tile lane-replicated stats in 128-lane "
            f"units: rep = block_k // 128)")
    return val


_BLOCK_Q = _block_env("MUVO_FLASH_BLOCK_Q", "512")
_BLOCK_K = _block_env("MUVO_FLASH_BLOCK_K", "512")
_LANE = 128
_NEG_INF = -1e30


def _interpret():
    return jax.default_backend() == "cpu"  # CPU tests run interpreted


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _d_pad(d):
    """Kernel head-dim width. Default: zero-pad to the 128-lane tile.
    MUVO_FLASH_DPAD=off keeps d logical (e.g. 32): Mosaic issues the
    qk^T/dp dots with the true contraction k=d instead of a 4x zero-padded
    k=128, and the pv/dq/dk/dv dots with true n=d output lanes."""
    if _os.environ.get("MUVO_FLASH_DPAD", "on") == "off":
        return max(32, _round_up(d, 32))
    return max(_LANE, _round_up(d, _LANE))


def _row_to(x, width):
    """Adapt a lane-replicated (rows, _LANE) stat to `width` lanes."""
    if width >= _LANE:
        return jnp.tile(x, (1, width // _LANE))
    return x[:, :width]


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------
def _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_ref, l_ref, acc_ref,
                  *, seq_len, block_k):
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # pre-scaled by 1/sqrt(d) on the host side
    k = k_ref[0]
    v = v_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (block_q, block_k)

    # Mask keys beyond the true sequence length (zero-padded tail). The
    # kernel is VPU-bound (exp/reduction), so the iota+compare+select runs
    # only on the one block that actually holds padded columns.
    s = _masked_tail(s, kv_idx, seq_len, block_k)

    # Stats stay lane-replicated at 128 wide: a (block_q, 1) column lives in
    # lane 0 only and every consumer op pays a cross-lane broadcast (this is
    # the layout jax's own TPU flash kernel uses for the same reason).
    m_prev = m_ref[...]  # (block_q, _LANE)
    l_prev = l_ref[...]
    m_cur = jnp.broadcast_to(jnp.max(s, axis=-1, keepdims=True),
                             m_prev.shape)
    m_next = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - jnp.tile(m_next, (1, s.shape[-1] // _LANE)))
    p_cast = p.astype(v.dtype)

    # The kernel is VPU-bound (exp + reductions) with the MXU well under
    # half busy, so the row-sum of p rides the MXU for free: p_cast · 1
    # yields the (block_q, _LANE) lane-replicated layout the stats want
    # directly (the jnp.sum form costs a big VPU reduce AND a cross-lane
    # broadcast). Numerics: the sum sees p in v.dtype — the same values the
    # pv matmul consumes — so o = (p·v) / l stays self-consistent.
    ones = jnp.ones((s.shape[-1], _LANE), v.dtype)
    l_cur = jax.lax.dot_general(
        p_cast, ones, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    l_next = alpha * l_prev + l_cur

    d_width = acc_ref.shape[-1]
    acc_ref[...] = acc_ref[...] * _row_to(alpha, d_width) + \
        jax.lax.dot_general(
            p_cast, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    m_ref[...] = m_next
    l_ref[...] = l_next

    @pl.when(kv_idx == pl.num_programs(2) - 1)
    def _finalize():
        o_ref[0] = (acc_ref[...] / _row_to(l_ref[...], d_width)).astype(
            o_ref.dtype)
        lse_ref[0] = m_ref[...] + jnp.log(l_ref[...])  # (block_q, _LANE)


def _flash_fwd(q, k, v, block_q, block_k, seq_len=None):
    """Returns (out (bh, n, d), lse (bh, n) fp32).

    seq_len: true token count when the caller pre-padded n to a block
    multiple (pad-once-through-the-stack, see world_model fusion); keys at
    positions >= seq_len are masked. Pad QUERY rows yield finite junk the
    caller slices off (q rows are row-local through softmax)."""
    bh, n, d = q.shape  # batch*heads fused into dim 0
    if seq_len is None:
        seq_len = n
    scale = 1.0 / (d ** 0.5)

    d_pad = _d_pad(d)
    nq_pad = _round_up(n, block_q)
    nk_pad = _round_up(n, block_k)

    def pad(x, n_to):
        return jnp.pad(x, ((0, 0), (0, n_to - n), (0, d_pad - d)))

    # Pre-scale q on the (n, d) operand: saves a VPU multiply over every
    # (block_q, block_k) score block inside the VPU-bound kernel.
    qp = pad(q * jnp.asarray(scale, q.dtype), nq_pad)
    kp, vp = pad(k, nk_pad), pad(v, nk_pad)
    grid = (bh, nq_pad // block_q, nk_pad // block_k)

    out, lse = pl.pallas_call(
        functools.partial(_flash_kernel, seq_len=seq_len, block_k=block_k),
        out_shape=[
            jax.ShapeDtypeStruct((bh, nq_pad, d_pad), q.dtype),
            jax.ShapeDtypeStruct((bh, nq_pad, _LANE), jnp.float32),
        ],
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, d_pad), lambda b, i, j: (b, i, 0)),
                pl.BlockSpec((1, block_k, d_pad), lambda b, i, j: (b, j, 0)),
                pl.BlockSpec((1, block_k, d_pad), lambda b, i, j: (b, j, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, block_q, d_pad), lambda b, i, j: (b, i, 0)),
                pl.BlockSpec((1, block_q, _LANE), lambda b, i, j: (b, i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_q, _LANE), jnp.float32),
                pltpu.VMEM((block_q, _LANE), jnp.float32),
                pltpu.VMEM((block_q, d_pad), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * nq_pad * nk_pad * d,  # qk^T + pv (useful, unpadded)
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize
            + bh * nq_pad * d_pad * qp.dtype.itemsize,
            transcendentals=bh * nq_pad * nk_pad,
        ),
        interpret=_interpret(),
    )(qp, kp, vp)
    return out[:, :n, :d], lse[:, :n, 0]


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------
def _masked_tail(s, idx, seq_len, block):
    """NEG_INF-mask padded columns — only materialised on the one ragged
    tail block (the kernels are partially VPU-bound; full blocks skip the
    iota+compare+select entirely)."""
    if seq_len % block == 0:
        return s

    def _mask(x):
        col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        return jnp.where(col < seq_len % block, x, _NEG_INF)

    return jax.lax.cond(idx == seq_len // block, _mask, lambda x: x, s)


def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                         dq_ref, acc_ref, *, scale, seq_len, block_k):
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # pre-scaled by 1/sqrt(d)
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    # lse/delta arrive lane-replicated (block_q, _LANE); tiling them to
    # block_k keeps the subtraction lane-local (no cross-lane broadcast)
    rep = block_k // _LANE
    lse = jnp.tile(lse_ref[0], (1, rep))
    delta = jnp.tile(delta_ref[0], (1, rep))

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    s = _masked_tail(s, kv_idx, seq_len, block_k)
    p = jnp.exp(s - lse)  # fp32 (block_q, block_k); 0 on masked cols

    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    # ds here is dL/ds for the PRE-scale scores (s = (scale q)·k); the
    # chain-rule factor `scale` lands once on the small finalize output
    # instead of on every (block_q, block_k) block.
    ds = p * (dp - delta)

    acc_ref[...] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(kv_idx == pl.num_programs(2) - 1)
    def _finalize():
        dq_ref[0] = (acc_ref[...] * scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                          dk_ref, dv_ref, dk_acc, dv_acc, *, seq_len,
                          block_k):
    q_idx = pl.program_id(2)

    @pl.when(q_idx == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q = q_ref[0]  # pre-scaled by 1/sqrt(d)
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    rep = block_k // _LANE
    lse = jnp.tile(lse_ref[0], (1, rep))
    delta = jnp.tile(delta_ref[0], (1, rep))

    kv_idx = pl.program_id(1)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    s = _masked_tail(s, kv_idx, seq_len, block_k)
    p = jnp.exp(s - lse)  # (block_q, block_k)

    # dv += p^T dO   (padded q rows contribute 0: their dO rows are 0)
    dv_acc[...] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - delta)  # pre-scale-s gradient; see dq kernel note

    # dk += ds^T q_scaled == scale · ds^T q — no scale op needed at all
    dk_acc[...] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(q_idx == pl.num_programs(2) - 1)
    def _finalize():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _flash_bwd_fused_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                            dq_ref, dk_ref, dv_ref, dq_acc, dk_acc, dv_acc,
                            *, scale, seq_len, block_q, block_k):
    """One-pass backward: dq, dk and dv from a SINGLE recompute of p per
    (kv, q) block pair. Grid (bh, kv, q) with q innermost: dk/dv accumulate
    per kv block across the inner q sweep; dq accumulates into a full-
    sequence fp32 VMEM scratch across the whole (kv, q) grid of each bh and
    flushes once at the last step. vs the two-kernel scheme this removes
    two of the seven matmuls (s and dp were computed twice) and half the
    exp()s — measured ~1.25x on the LARGE-path step (bench.py --large)."""
    kv_idx = pl.program_id(1)
    q_idx = pl.program_id(2)

    @pl.when(jnp.logical_and(kv_idx == 0, q_idx == 0))
    def _init_dq():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    @pl.when(q_idx == 0)
    def _init_dkv():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q = q_ref[0]  # pre-scaled by 1/sqrt(d)
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    rep = block_k // _LANE
    lse = jnp.tile(lse_ref[0], (1, rep))
    delta = jnp.tile(delta_ref[0], (1, rep))

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    s = _masked_tail(s, kv_idx, seq_len, block_k)
    p = jnp.exp(s - lse)  # (block_q, block_k); 0 on masked cols

    # dv += p^T dO  (padded q rows have dO == 0)
    dv_acc[...] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - delta)  # pre-scale-s gradient (see _flash_bwd_dq_kernel)
    ds_cast = ds.astype(k.dtype)

    # dq rows of this q block accumulate across the outer kv sweep
    dq_acc[pl.ds(q_idx * block_q, block_q), :] += jax.lax.dot_general(
        ds_cast, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    # dk += ds^T q_scaled == scale · ds^T q
    dk_acc[...] += jax.lax.dot_general(
        ds_cast, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(q_idx == pl.num_programs(2) - 1)
    def _flush_dkv():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)

    @pl.when(jnp.logical_and(kv_idx == pl.num_programs(1) - 1,
                             q_idx == pl.num_programs(2) - 1))
    def _flush_dq():
        dq_ref[0] = (dq_acc[...] * scale).astype(dq_ref.dtype)


def _flash_bwd_fused(q, k, v, o, lse, do, block_q, block_k, seq_len=None):
    """Single-kernel backward (dq + dk + dv). Inputs as _flash_bwd."""
    bh, n, d = q.shape
    if seq_len is None:
        seq_len = n
    scale = 1.0 / (d ** 0.5)

    d_pad = _d_pad(d)
    nq_pad = _round_up(n, block_q)
    nk_pad = _round_up(n, block_k)

    def pad(x, n_to):
        return jnp.pad(x, ((0, 0), (0, n_to - n), (0, d_pad - d)))

    qp, dop = pad(q * jnp.asarray(scale, q.dtype), nq_pad), pad(do, nq_pad)
    kp, vp = pad(k, nk_pad), pad(v, nk_pad)

    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    delta = jnp.pad(delta, ((0, 0), (0, nq_pad - n)))
    delta = jnp.broadcast_to(delta[..., None], (bh, nq_pad, _LANE))
    lse_p = jnp.pad(lse, ((0, 0), (0, nq_pad - n)))
    lse_p = jnp.broadcast_to(lse_p[..., None], (bh, nq_pad, _LANE))

    # grid (bh, kv, q): q innermost so k/v/dk/dv windows stay resident per
    # kv block while q/do/lse/delta stream
    q_spec = pl.BlockSpec((1, block_q, d_pad), lambda b, j, i: (b, i, 0))
    kv_spec = pl.BlockSpec((1, block_k, d_pad), lambda b, j, i: (b, j, 0))
    row_spec = pl.BlockSpec((1, block_q, _LANE), lambda b, j, i: (b, i, 0))
    dq_spec = pl.BlockSpec((1, nq_pad, d_pad), lambda b, j, i: (b, 0, 0))

    dq, dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_fused_kernel, scale=scale,
                          seq_len=seq_len,
                          block_q=block_q, block_k=block_k),
        out_shape=[
            jax.ShapeDtypeStruct((bh, nq_pad, d_pad), q.dtype),
            jax.ShapeDtypeStruct((bh, nk_pad, d_pad), k.dtype),
            jax.ShapeDtypeStruct((bh, nk_pad, d_pad), v.dtype),
        ],
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(bh, nk_pad // block_k, nq_pad // block_q),
            in_specs=[q_spec, kv_spec, kv_spec, q_spec, row_spec, row_spec],
            out_specs=[dq_spec, kv_spec, kv_spec],
            scratch_shapes=[
                pltpu.VMEM((nq_pad, d_pad), jnp.float32),
                pltpu.VMEM((block_k, d_pad), jnp.float32),
                pltpu.VMEM((block_k, d_pad), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * bh * nq_pad * nk_pad * d,  # s+dp+dv+dq+dk (useful)
            bytes_accessed=(qp.size + kp.size + vp.size + dop.size)
            * qp.dtype.itemsize
            + (bh * nq_pad * d_pad + 2 * bh * nk_pad * d_pad)
            * qp.dtype.itemsize,
            transcendentals=bh * nq_pad * nk_pad,
        ),
        interpret=_interpret(),
    )(qp, kp, vp, dop, lse_p, delta)
    return dq[:, :n, :d], dk[:, :n, :d], dv[:, :n, :d]


def _flash_bwd(q, k, v, o, lse, do, block_q, block_k, seq_len=None):
    """Flash backward; all inputs (bh, n, d) except lse (bh, n) fp32."""
    bh, n, d = q.shape
    if seq_len is None:
        seq_len = n
    scale = 1.0 / (d ** 0.5)

    d_pad = _d_pad(d)
    nq_pad = _round_up(n, block_q)
    nk_pad = _round_up(n, block_k)

    def pad(x, n_to):
        return jnp.pad(x, ((0, 0), (0, n_to - n), (0, d_pad - d)))

    # q pre-scaled (see _flash_fwd): s matches the fwd's saved lse, dk
    # needs no scale op, dq applies scale once at finalize.
    qp, dop = pad(q * jnp.asarray(scale, q.dtype), nq_pad), pad(do, nq_pad)
    kp, vp = pad(k, nk_pad), pad(v, nk_pad)

    # D = rowsum(dO ⊙ O): tiny elementwise reduce, XLA fuses it with the
    # surrounding pads; broadcast across the lane dim for aligned DMA.
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    delta = jnp.pad(delta, ((0, 0), (0, nq_pad - n)))
    delta = jnp.broadcast_to(delta[..., None], (bh, nq_pad, _LANE))
    lse_p = jnp.pad(lse, ((0, 0), (0, nq_pad - n)))
    lse_p = jnp.broadcast_to(lse_p[..., None], (bh, nq_pad, _LANE))

    q_spec = pl.BlockSpec((1, block_q, d_pad), lambda b, i, j: (b, i, 0))
    kv_spec_dq = pl.BlockSpec((1, block_k, d_pad), lambda b, i, j: (b, j, 0))
    row_spec = pl.BlockSpec((1, block_q, _LANE), lambda b, i, j: (b, i, 0))

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale, seq_len=seq_len,
                          block_k=block_k),
        out_shape=jax.ShapeDtypeStruct((bh, nq_pad, d_pad), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(bh, nq_pad // block_q, nk_pad // block_k),
            in_specs=[q_spec, kv_spec_dq, kv_spec_dq, q_spec, row_spec,
                      row_spec],
            out_specs=q_spec,
            scratch_shapes=[pltpu.VMEM((block_q, d_pad), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * bh * nq_pad * nk_pad * d,  # s + dp + ds·k (useful)
            bytes_accessed=(qp.size + kp.size + vp.size + dop.size)
            * qp.dtype.itemsize + bh * nq_pad * d_pad * qp.dtype.itemsize,
            transcendentals=bh * nq_pad * nk_pad,
        ),
        interpret=_interpret(),
    )(qp, kp, vp, dop, lse_p, delta)

    # dkv grid: (bh, kv block, q block) — accumulate over q blocks.
    q_spec2 = pl.BlockSpec((1, block_q, d_pad), lambda b, j, i: (b, i, 0))
    kv_spec2 = pl.BlockSpec((1, block_k, d_pad), lambda b, j, i: (b, j, 0))
    row_spec2 = pl.BlockSpec((1, block_q, _LANE), lambda b, j, i: (b, i, 0))

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, seq_len=seq_len,
                          block_k=block_k),
        out_shape=[
            jax.ShapeDtypeStruct((bh, nk_pad, d_pad), k.dtype),
            jax.ShapeDtypeStruct((bh, nk_pad, d_pad), v.dtype),
        ],
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(bh, nk_pad // block_k, nq_pad // block_q),
            in_specs=[q_spec2, kv_spec2, kv_spec2, q_spec2, row_spec2,
                      row_spec2],
            out_specs=[kv_spec2, kv_spec2],
            scratch_shapes=[
                pltpu.VMEM((block_k, d_pad), jnp.float32),
                pltpu.VMEM((block_k, d_pad), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * bh * nq_pad * nk_pad * d,  # s + dp + dv + dk (useful)
            bytes_accessed=(qp.size + kp.size + vp.size + dop.size)
            * qp.dtype.itemsize
            + 2 * bh * nk_pad * d_pad * qp.dtype.itemsize,
            transcendentals=bh * nq_pad * nk_pad,
        ),
        interpret=_interpret(),
    )(qp, kp, vp, dop, lse_p, delta)

    return dq[:, :n, :d], dk[:, :n, :d], dv[:, :n, :d]


# ---------------------------------------------------------------------------
# custom-vjp wrapper
# ---------------------------------------------------------------------------
def _reference_attention(q, k, v):
    d = q.shape[-1]
    s = jnp.einsum("bqd,bkd->bqk", q, k, preferred_element_type=jnp.float32)
    w = jax.nn.softmax(s / (d ** 0.5), axis=-1).astype(v.dtype)
    return jnp.einsum("bqk,bkd->bqd", w, v)


def _blocks(n):
    bq = min(_BLOCK_Q, _round_up(n, 128))
    bk = min(_BLOCK_K, _round_up(n, 128))
    return bq, bk


def _flatten(x):
    bh = x.shape[0] * x.shape[1]
    return x.reshape((bh,) + x.shape[2:])


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash(q, k, v, seq_len):
    n = q.shape[2]
    bq, bk = _blocks(n)
    out, _ = _flash_fwd(_flatten(q), _flatten(k), _flatten(v), bq, bk,
                        seq_len=seq_len)
    return out.reshape(q.shape)


def _flash_vjp_fwd(q, k, v, seq_len):
    n = q.shape[2]
    bq, bk = _blocks(n)
    out, lse = _flash_fwd(_flatten(q), _flatten(k), _flatten(v), bq, bk,
                          seq_len=seq_len)
    return out.reshape(q.shape), (q, k, v, out.reshape(q.shape), lse)


# The fused backward holds a FULL-SEQUENCE (nq_pad, d_pad) fp32 dq
# accumulator in VMEM (~2.9 MB at n=5184, d_pad=128); it scales linearly
# with n and would crowd out the block operands on much longer sequences.
# Beyond this budget fall back to the two-kernel scheme, which streams dq
# per block (block-sized scratch only).
_FUSED_DQ_VMEM_BUDGET = 8 * 1024 * 1024  # bytes; ~n<=16k at d_pad=128


def _flash_vjp_bwd(seq_len, res, g):
    import os

    q, k, v, o, lse = res
    n = q.shape[2]
    bq, bk = _blocks(n)
    # fused one-pass kernel by default; MUVO_FLASH_FUSED_BWD=off restores
    # the two-kernel (dq then dkv) scheme
    dq_scratch = _round_up(n, bq) * _d_pad(q.shape[-1]) * 4
    use_fused = (os.environ.get("MUVO_FLASH_FUSED_BWD", "on") != "off"
                 and dq_scratch <= _FUSED_DQ_VMEM_BUDGET)
    bwd = _flash_bwd_fused if use_fused else _flash_bwd
    dq, dk, dv = bwd(
        _flatten(q), _flatten(k), _flatten(v), _flatten(o), lse,
        _flatten(g.astype(q.dtype)), bq, bk, seq_len=seq_len)
    return dq.reshape(q.shape), dk.reshape(k.shape), dv.reshape(v.shape)


_flash.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


def padded_len(n: int) -> int:
    """Token count the flash kernels pad `n` to. Callers running several
    attention layers back-to-back should pad ONCE to this length and pass
    the true `seq_len` down (pad-once-through-the-stack) — the per-layer
    jnp.pad/slice pairs around each kernel otherwise cost real HBM passes
    (measured ~20 ms/step on the LARGE fusion transformer)."""
    import math

    bq, bk = _blocks(n)
    return _round_up(n, math.lcm(bq, bk))


def flash_attention(q, k, v, seq_len: int | None = None):
    """q, k, v: (B, H, N, D) -> (B, H, N, D).

    seq_len: true token count when N is pre-padded to a block multiple
    (see padded_len). Keys/values beyond seq_len are masked out exactly;
    outputs at pad rows are finite junk for the caller to discard."""
    assert q.shape == k.shape == v.shape
    return _flash(q, k, v, seq_len)
