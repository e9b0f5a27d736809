"""Pallas TPU kernel for the z-folded 3-D convolution (+ bias + LeakyReLU).

The XLA lowering of the blocked z-fold conv (ops/conv3d_zband.py) spends more
time materialising overlapped z-blocks and shuffling layouts than it does on
the MXU: profiling the flagship step shows the voxel decoder at 409 ms of a
715 ms step, roughly half of it fold copies / pad-slices / layout moves
around the conv matmuls. This kernel performs the same banded matmul
directly from a haloed VMEM tile:

  * input stays (B, X+2, Y+2, (Z+2)*C) in HBM (one cheap XLA pad + free
    reshape); each grid step DMAs one (xt+2, Y+2, (f+2)*C) stripe with the
    next stripe prefetched double-buffered,
  * the banded weight (3, 3, (f+2)*C, f*Cout) is built once per call from
    the ordinary (3, 3, 3, C, Cout) parameter (zero outside |dz| <= 1) and
    lives whole in VMEM,
  * 9 MXU matmuls per stripe accumulate in fp32, bias + LeakyReLU fuse in,
  * the output block (xt, Y, f*Cout) writes straight into a
    (B, X, Y, Z*Cout) buffer — a free bitcast away from (B, X, Y, Z, Cout),
    so no unfold transpose exists at all.

Backward: dx is the same kernel with the adjoint banded weight (spatially
flipped kernel, C/Cout swapped); dW is one XLA reduction conv (contraction
over batch and all of space); dbias a sum. Wrapped in jax.custom_vjp so the
fused bias+LeakyReLU differentiates correctly.

Reference op: muvo/models/common.py:498-546 VoxelDecoder1's 3x3x3 convs.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def banded_weight(kernel: jnp.ndarray, f: int, dtype) -> jnp.ndarray:
    """(3, 3, 3, C, Cout) -> (3, 3, (f+2)*C, f*Cout) block-banded over z.

    Input rows are the f+2 z-slices [z0-1 .. z0+f] feeding a block of f
    outputs; W[(i, ci), (j, co)] = kernel[.., i - j, ci, co] for i-j in
    {0, 1, 2} (i indexes the haloed input, j the block output).
    """
    _, _, kd, C, Cout = kernel.shape
    assert kd == 3
    W = jnp.zeros((3, 3, f + 2, C, f, Cout), dtype)
    for dz in range(3):
        idx_j = jnp.arange(f)
        idx_i = idx_j + dz  # input z (haloed) = output z + dz
        W = W.at[:, :, idx_i, :, idx_j, :].add(
            kernel[:, :, dz].astype(dtype)[None]
        )
    return W.reshape(3, 3, (f + 2) * C, f * Cout)


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def _up_matrix_np(n: int):
    """(2n, n) half-pixel 2x linear interpolation (edges clamped)."""
    import numpy as np

    U = np.zeros((2 * n, n), np.float32)
    for u in range(2 * n):
        k = u // 2
        if u % 2 == 0:
            U[u, max(k - 1, 0)] += 0.25
            U[u, k] += 0.75
        else:
            U[u, k] += 0.75
            U[u, min(k + 1, n - 1)] += 0.25
    return U


def _z_coeff_np(Zs: int):
    """B[z, s, dz] = Upad[z + dz - 1, s]: the scalar weight tying big-z
    output z to small-z input s through conv tap dz, composing the 2x
    z-upsample (clamped) with the conv's zero padding."""
    import numpy as np

    U = _up_matrix_np(Zs)
    Upad = np.zeros((2 * Zs + 2, Zs), np.float32)
    Upad[1:2 * Zs + 1] = U
    B = np.zeros((2 * Zs, Zs, 3), np.float32)
    for dz in range(3):
        B[:, :, dz] = Upad[dz: dz + 2 * Zs]
    return B


def up_banded_weight(kernel: jnp.ndarray, Zs: int, f: int, dtype):
    """Per-z-block weights for the FUSED upsample+conv: (zb, 3, 3, fs*C,
    f*Cout) where fs = f//2 + 2 small-z slices (1-slice halo each side,
    matching a front-padded input) feed each block of f big-z outputs.
    Blocks differ at the z edges (upsample clamping / conv zero pad), so
    the block axis is explicit."""
    import numpy as np

    _, _, _, C, Cout = kernel.shape
    Z = 2 * Zs
    zb = Z // f
    fs = f // 2 + 2
    B = _z_coeff_np(Zs)
    # A[b, j, i, dz]: coefficient of padded small slice i (original
    # s = s0 + i - 1, s0 = b*f//2) on block output j (big z = b*f + j)
    A = np.zeros((zb, f, fs, 3), np.float32)
    for b in range(zb):
        for i in range(fs):
            s = b * (f // 2) + i - 1
            if 0 <= s < Zs:
                A[b, :, i, :] = B[b * f: (b + 1) * f, s, :]
    A = jnp.asarray(A)
    W2 = jnp.einsum("bjid,xydce->bxyicje", A, kernel.astype(jnp.float32))
    return W2.reshape(zb, 3, 3, fs * C, f * Cout).astype(dtype)


def up_banded_adjoint_weight(kernel: jnp.ndarray, Zs: int, fp: int, dtype):
    """Adjoint per-block weights: (zb', 3, 3, win*Cout, fp*C) mapping a
    window of win = 2*fp + 4 big-z grad slices (front-padded by 2) onto a
    block of fp small-z inputs; spatial taps flipped, channels swapped.

    The window genuinely needs the z = 2*b*fp - 2 slice: B[2s-2, s, dz=2]
    = U[2s-1, s] = 0.25 (verified numerically), so a front halo of ONE
    does NOT suffice — a padded_out cotangent (front=1 layout) must be
    lane-shifted by Cout before this adjoint (see _up_vjp_bwd). front=2
    also keeps every block window on a 128-aligned lane offset (slot
    2*b*fp), which a front=1 start (slot 2*b*fp - 1) would break."""
    import numpy as np

    _, _, _, C, Cout = kernel.shape
    Z = 2 * Zs
    zbp = Zs // fp
    win = 2 * fp + 4
    B = _z_coeff_np(Zs)
    # A[b, j, i, dz]: coefficient of padded big grad slice i (original
    # z = 2*b*fp - 2 + i) on small input j (s = b*fp + j)
    A = np.zeros((zbp, fp, win, 3), np.float32)
    for b in range(zbp):
        for i in range(win):
            z = 2 * b * fp - 2 + i
            if 0 <= z < Z:
                A[b, :, i, :] = B[z, b * fp: (b + 1) * fp, :]
    A = jnp.asarray(A)
    kflip = jnp.flip(kernel, axis=(0, 1)).astype(jnp.float32)
    W2 = jnp.einsum("bjid,xydce->bxyiejc", A, kflip)
    return W2.reshape(zbp, 3, 3, win * Cout, fp * C).astype(dtype)


Y_FRONT = 1  # y-front halo rows of the _pad_folded layout. 8 (a full
# sublane tile) makes every padded-IO interior STORE tile-aligned, but the
# measured flagship bench got WORSE (50.3 vs 52.3 f/s): the wider slabs tax
# every XLA pad and stripe DMA, including the default non-padded path. With
# 1, padded-IO stores pay a per-block relayout instead (51.6) — both lose
# to the plain layout, which is why MUVO_PADDED_IO defaults to off.


def _padded_dims(Y: int, Z: int, C: int, front: int = 1,
                 min_tail: int = 1) -> tuple:
    """(Yp, Zp) of the _pad_folded layout for logical (Y, Z) at C channels."""
    import math

    Yp = _round_up(Y_FRONT + Y + 1, 8)
    zstep = 128 // math.gcd(C, 128)
    Zp = _round_up(Z + front + min_tail, zstep)
    return Yp, Zp


def _zconv_pallas_raw(xpad2, Wb, bias_row, *, B, X, Y, Z, f, C, Cout, xt,
                      slope: Optional[float], out_dtype, interpret: bool,
                      stride_lanes: Optional[int] = None,
                      padded_out: bool = False):
    """xpad2: (B, X+2, Yp, Zp*C) — Y and Z*C padded so the tiled (sublane,
    lane) dims of every DMA slice are (8, 128)-aligned. Wb: (3, 3, (f+2)C,
    f*Cout) shared, or (zb, 3, 3, win, f*Cout) per-block; bias_row:
    (1, f*Cout) or None. Returns (B, X, Y, Z*Cout), or — with
    ``padded_out`` — the same result already in the _pad_folded layout
    (B, X+2, Yp', Zp'*Cout) with a zeroed halo, so the NEXT banded conv
    (and this op's own adjoint) can consume it without an XLA pad pass.

    padded_out requires ``Wb`` (not the bias — it is Cout-periodic, so
    invariant) PRE-ROLLED by +Cout on its last axis: the MXU then emits
    each block already carrying the layout's +Cout lane offset for free,
    and a one-select chain stitches each block's first Cout lanes from
    the previous block's tail. Every store stays tile-aligned (sublane
    offset Y_FRONT, lane offsets zbi*fco) — Mosaic cannot DMA at
    unaligned tiled offsets and unaligned VPU stores cost a relayout.

    Grid walks (B, X/xt) stripes; each stripe DMAs its full (Yp, Zp*C) slab
    once (next stripe prefetched, double-buffered) and the z-block loop runs
    over lane-offset windows in VMEM, so no overlapped z-halo is ever
    materialised in HBM.
    """
    zb = Z // f
    nX = X // xt
    N = B * nX
    fco = f * Cout
    # per-block weights (leading zb axis) carry a custom input window and
    # block stride — used by the fused upsample+conv; shared weights use
    # the plain (f+2)-halo banded window
    per_block = Wb.ndim == 5
    fc_in = Wb.shape[-2]
    stride = stride_lanes if stride_lanes is not None else f * C
    Yp = xpad2.shape[2]
    ZpC = xpad2.shape[3]
    Yp_o, Zp_o = _padded_dims(Y, Z, Cout)
    y0 = Y_FRONT - 1  # first window row: output row y reads y0 + dy + y

    has_bias = bias_row is not None

    def kernel(xpad_ref, wb_ref, *rest):
        rest = list(rest)
        bias_ref = rest.pop(0) if has_bias else None
        out_ref = rest.pop(0)
        scratch, sem = rest.pop(0), rest.pop(0)
        if padded_out:
            sout, zrow, osem, zsem = rest
        i = pl.program_id(0)

        def dma(step, slot):
            xi = jax.lax.rem(step, jnp.asarray(nX, step.dtype))
            b = step // nX
            return pltpu.make_async_copy(
                xpad_ref.at[b, pl.ds(xi * xt, xt + 2), :, :],
                scratch.at[slot],
                sem.at[slot],
            )

        slot = jax.lax.rem(i, jnp.asarray(2, i.dtype))

        @pl.when(i == 0)
        def _():
            dma(i, slot).start()

        if padded_out:
            ZpCo = sout.shape[-1]

            def out_dma(step, oslot):
                xi_ = jax.lax.rem(step, jnp.asarray(nX, step.dtype))
                b_ = step // nX
                return pltpu.make_async_copy(
                    sout.at[oslot],
                    out_ref.at[b_, pl.ds(1 + xi_ * xt, xt)],
                    osem.at[oslot])

            @pl.when(i == 0)
            def _():
                # row margins (< Y_FRONT, > Y_FRONT+Y) are never stored to
                # and stay zero; the lane margin beyond the tail block is
                # likewise store-free
                sout[...] = jnp.zeros_like(sout)
                zrow[...] = jnp.zeros_like(zrow)

            # the slot's copy from two steps ago had a full stripe of
            # compute to drain; only now is the slab rewritten
            @pl.when(i >= 2)
            def _():
                out_dma(i - 2, slot).wait()

        @pl.when(i + 1 < N)
        def _():
            dma(i + 1, 1 - slot).start()

        dma(i, slot).wait()
        tile = scratch[slot]  # (xt+2, Yp, Zp*C)

        prev = None
        if padded_out:
            lane = jax.lax.broadcasted_iota(jnp.int32, (xt, Y, fco), 2)
        for zbi in range(zb):
            off = zbi * stride  # multiple of 128 by construction
            acc = jnp.zeros((xt * Y, fco), jnp.float32)
            for dx in range(3):
                for dy in range(3):
                    win = tile[dx:dx + xt, y0 + dy:y0 + dy + Y,
                               off:off + fc_in]
                    w = wb_ref[zbi, dx, dy] if per_block else wb_ref[dx, dy]
                    acc = acc + jnp.dot(
                        win.reshape(xt * Y, fc_in), w,
                        preferred_element_type=jnp.float32)
            if has_bias:
                acc = acc + bias_ref[:].astype(jnp.float32)
            if slope is not None:
                acc = jnp.where(acc >= 0, acc, slope * acc)
            res = acc.reshape(xt, Y, fco).astype(out_dtype)
            if padded_out:
                # res is ROLLED: lane k holds output k-Cout; its first Cout
                # lanes (the block's own tail) belong one block later, and
                # the first Cout lanes HERE come from the previous block's
                # tail (zeros for block 0 — the z front halo)
                first = jnp.zeros_like(res) if prev is None else prev
                sout[slot, :, Y_FRONT:Y_FRONT + Y,
                     zbi * fco:(zbi + 1) * fco] = jnp.where(
                         lane < Cout, first, res)
                prev = res
            else:
                out_ref[0, :, :, zbi * fco:(zbi + 1) * fco] = res

        if padded_out:
            # tail block: the last block's carried tail, then zeros
            wt = min(fco, ZpCo - zb * fco)
            sout[slot, :, Y_FRONT:Y_FRONT + Y,
                 zb * fco:zb * fco + wt] = jnp.where(
                     lane[:, :, :wt] < Cout, prev[:, :, :wt],
                     jnp.zeros((), out_dtype))

            xi = jax.lax.rem(i, jnp.asarray(nX, i.dtype))
            b = i // nX
            out_dma(i, slot).start()

            @pl.when(xi == 0)
            def _():
                zc = pltpu.make_async_copy(
                    zrow, out_ref.at[b, pl.ds(0, 1)], zsem)
                zc.start()
                zc.wait()

            @pl.when(xi == nX - 1)
            def _():
                zc = pltpu.make_async_copy(
                    zrow, out_ref.at[b, pl.ds(X + 1, 1)], zsem)
                zc.start()
                zc.wait()

            # drain every outstanding copy before the kernel retires
            @pl.when(i == N - 1)
            def _():
                out_dma(i, slot).wait()

                @pl.when(jnp.asarray(N > 1) & (i >= 1))
                def _():
                    out_dma(i - 1, 1 - slot).wait()

    def out_index(i):
        return (i // nX, jax.lax.rem(i, jnp.asarray(nX, i.dtype)), 0, 0)

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    operands = [xpad2, Wb]
    if has_bias:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        operands.append(bias_row)

    scratch_shapes = [
        pltpu.VMEM((2, xt + 2, Yp, ZpC), xpad2.dtype),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if padded_out:
        out_specs = pl.BlockSpec(memory_space=pl.ANY)
        out_shape = jax.ShapeDtypeStruct(
            (B, X + 2, Yp_o, Zp_o * Cout), out_dtype)
        out_bytes = out_shape.size * 2
        scratch_shapes += [
            pltpu.VMEM((2, xt, Yp_o, Zp_o * Cout), out_dtype),
            pltpu.VMEM((1, Yp_o, Zp_o * Cout), out_dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ]
    else:
        out_specs = pl.BlockSpec((1, xt, Y, Z * Cout), out_index,
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((B, X, Y, Z * Cout), out_dtype)
        out_bytes = B * X * Y * Z * Cout * 2

    return pl.pallas_call(
        kernel,
        grid=(N,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * zb * X * Y * 9 * fc_in * fco,
            bytes_accessed=xpad2.size * xpad2.dtype.itemsize + out_bytes,
            transcendentals=0,
        ),
    )(*operands)


def _dw_pallas(xpad2, g, *, B, X, Y, fc_in, fco, zb, stride, per_block,
               interpret, g_padded: bool = False, g_cout: int = 0):
    """Banded weight gradient in one pass: dW[(zbi,)dxi,dyi] = win^T @ g.

    Replaces the dynamic_slice+einsum loop, which materialised a full
    (B, X, Y, fc_in) window copy per (tap, z-block) — ~46 GB of HBM traffic
    on the flagship voxel conv3 (measured 2 x 37.8 ms/step). Here each
    (b, x-stripe) is DMA'd once (double-buffered, same stripe walk as the
    forward kernel) and all zb*9 tap gradients accumulate in a VMEM
    scratch-resident output block.

    xpad2: (B, X+2, Yp, ZpC); g: (B, X, Y, zb*fco) — or, with ``g_padded``,
    the cotangent already in the _pad_folded layout (zero halo, interior at
    (+Y_FRONT row, +g_cout lanes)). The padded g is read via ALIGNED
    fco-blocks: block zbi's true cotangent is its aligned block rolled by
    -g_cout with the wrapped tail taken from block zbi+1's head, so the
    kernel contracts against the select of two aligned reads (no roll, no
    misaligned access) and the resulting dW comes out with its last axis
    rolled by +g_cout — un-rolled here on the tiny output after the call.
    Returns f32 (zb, 3, 3, fc_in, fco) when per_block else (3, 3, fc_in, fco).
    """
    Yp, ZpC = xpad2.shape[2], xpad2.shape[3]
    ZCo = zb * fco
    g_lanes = g.shape[3]
    itemsize = jnp.dtype(xpad2.dtype).itemsize
    y0 = Y_FRONT - 1
    out_shape = ((zb, 3, 3, fc_in, fco) if per_block
                 else (3, 3, fc_in, fco))
    dw_bytes = 4 * zb * 9 * fc_in * fco if per_block else 4 * 9 * fc_in * fco

    budget = 26 * 1024 * 1024
    xt = 1
    for cand in (8, 4, 2, 1):
        if X % cand != 0:
            continue
        foot = (2 * (cand + 2) * Yp * ZpC * itemsize
                + 2 * cand * g.shape[2] * g_lanes * itemsize + dw_bytes
                + cand * Y * max(fc_in, fco) * 4)
        if foot <= budget:
            xt = cand
            break
    nX = X // xt
    N = B * nX

    def kernel(x_ref, g_ref, out_ref, xs, gs, xsem, gsem):
        i = pl.program_id(0)

        def dma_x(step, slot):
            xi = jax.lax.rem(step, jnp.asarray(nX, step.dtype))
            b = step // nX
            return pltpu.make_async_copy(
                x_ref.at[b, pl.ds(xi * xt, xt + 2), :, :],
                xs.at[slot], xsem.at[slot])

        def dma_g(step, slot):
            xi = jax.lax.rem(step, jnp.asarray(nX, step.dtype))
            b = step // nX
            row0 = xi * xt + (1 if g_padded else 0)
            return pltpu.make_async_copy(
                g_ref.at[b, pl.ds(row0, xt), :, :],
                gs.at[slot], gsem.at[slot])

        slot = jax.lax.rem(i, jnp.asarray(2, i.dtype))

        @pl.when(i == 0)
        def _():
            dma_x(i, slot).start()
            dma_g(i, slot).start()
            out_ref[...] = jnp.zeros_like(out_ref)

        @pl.when(i + 1 < N)
        def _():
            dma_x(i + 1, 1 - slot).start()
            dma_g(i + 1, 1 - slot).start()

        dma_x(i, slot).wait()
        dma_g(i, slot).wait()
        x_t = xs[slot]   # (xt+2, Yp, ZpC)
        g_t = gs[slot]   # (xt, Y, zb*fco) or the padded slab rows

        if g_padded:
            lane = jax.lax.broadcasted_iota(jnp.int32, (xt, Y, fco), 2)

        def g_block(zbi):
            if not g_padded:
                return g_t[:, :, zbi * fco:(zbi + 1) * fco]
            cur = g_t[:, Y_FRONT:Y_FRONT + Y, zbi * fco:(zbi + 1) * fco]
            if zbi + 1 < zb:
                nxt = g_t[:, Y_FRONT:Y_FRONT + Y,
                          (zbi + 1) * fco:(zbi + 2) * fco]
            else:
                # the last block's wrapped head lives in the layout's tail
                # block (its first g_cout lanes); only lane < g_cout is
                # selected, so pad the partial read out to fco with zeros
                wt = min(fco, g_lanes - zb * fco)
                part = g_t[:, Y_FRONT:Y_FRONT + Y,
                           zb * fco:zb * fco + wt]
                nxt = jnp.pad(part, ((0, 0), (0, 0), (0, fco - wt)))
            return jnp.where(lane < g_cout, nxt, cur)

        for zbi in range(zb):
            off = zbi * stride  # 128-multiple by construction
            go = g_block(zbi).reshape(xt * Y, fco)
            for dxi in range(3):
                for dyi in range(3):
                    win = x_t[dxi:dxi + xt, y0 + dyi:y0 + dyi + Y,
                              off:off + fc_in].reshape(xt * Y, fc_in)
                    acc = jax.lax.dot_general(
                        win, go, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    if per_block:
                        out_ref[zbi, dxi, dyi] += acc
                    else:
                        out_ref[dxi, dyi] += acc

    out_index = ((lambda i: (0, 0, 0, 0, 0)) if per_block
                 else (lambda i: (0, 0, 0, 0)))
    dW = pl.pallas_call(
        kernel,
        grid=(N,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(out_shape, out_index,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, xt + 2, Yp, ZpC), xpad2.dtype),
            pltpu.VMEM((2, xt, g.shape[2], g_lanes), g.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * X * Y * zb * 9 * fc_in * fco,
            bytes_accessed=xpad2.size * itemsize + g.size * itemsize
            + dw_bytes,
            transcendentals=0,
        ),
    )(xpad2, g)
    if g_padded:
        # the select-of-aligned-blocks contraction produced dW against the
        # +g_cout-rolled cotangent basis; un-roll on the tiny weight grad
        dW = jnp.roll(dW, -g_cout, axis=-1)
    return dW


def _pick_xt(X: int, Yp: int = 0, ZpC: int = 0, Y: int = 0, Z: int = 0,
             cout: int = 0, itemsize: int = 2,
             padded_out: bool = False) -> int:
    """Largest X tile whose VMEM footprint (double-buffered input stripes +
    pipelined output blocks + accumulator) stays within the raised Mosaic
    scoped-vmem budget."""
    budget = 26 * 1024 * 1024
    for xt in (8, 4, 2, 1):
        if X % xt != 0:
            continue
        if not Yp:
            return xt
        scratch = 2 * (xt + 2) * Yp * ZpC * itemsize
        if padded_out:
            Yp_o, Zp_o = _padded_dims(Y, Z, cout)
            out = (2 * xt + 1) * Yp_o * Zp_o * cout * itemsize
        else:
            out = 2 * xt * Y * Z * cout * itemsize
        acc = xt * Y * 128 * 4 * 2
        if scratch + out + acc <= budget:
            return xt
    return 1


def _pad_folded(x4, C: int, front: int = 1, min_tail: int = 1):
    """4-D pad for the kernel: +1 x ring, a Y_FRONT/+1 y ring, a z-halo of
    ``front`` zero slices in front, and tail zeros to align the tiled
    (sublane, lane) dims to (8, 128). Everything stays in the folded
    row-major domain — a 5-D pad here drew a 5.3x-padded layout from XLA
    (measured 10.7 GB on the flagship step)."""
    import math

    B, X, Y, ZC = x4.shape
    Z = ZC // C
    Yp = _round_up(Y_FRONT + Y + 1, 8)
    zstep = 128 // math.gcd(C, 128)
    Zp = _round_up(Z + front + min_tail, zstep)
    xpad = jnp.pad(x4, ((0, 0), (1, 1), (Y_FRONT, Yp - Y - Y_FRONT),
                        (front * C, (Zp - Z - front) * C)))
    return xpad, Yp, Zp


def _fwd_folded(x4, kernel, bias, C: int, f: int, slope: Optional[float],
                interpret: bool, pre_padded: bool = False,
                padded_out: bool = False, logical_yz=None):
    """x4: (B, X, Y, Z*C) folded — or, with ``pre_padded``, already in the
    _pad_folded layout (B, X+2, Yp, Zp*C) with ``logical_yz=(Y, Z)``.
    Returns (B, X, Y, Z*Cout) folded (padded layout when ``padded_out``)."""
    dtype = x4.dtype
    if pre_padded:
        Y, Z = logical_yz
        B, X = x4.shape[0], x4.shape[1] - 2
        xpad2 = x4
        Yp, ZpC = x4.shape[2], x4.shape[3]
    else:
        B, X, Y, ZC = x4.shape
        Z = ZC // C
        xpad2, Yp, Zp = _pad_folded(x4, C)
        ZpC = Zp * C
    Cout = kernel.shape[-1]
    Wb = banded_weight(kernel, f, dtype)
    if padded_out:
        # pre-roll so the MXU emits each block at the layout's +Cout lane
        # offset (see _zconv_pallas_raw); the bias row is Cout-periodic
        # and needs no roll
        Wb = jnp.roll(Wb, Cout, axis=-1)
    bias_row = None
    if bias is not None:
        bias_row = jnp.tile(bias.astype(dtype), (f,)).reshape(1, f * Cout)
    xt = _pick_xt(X, Yp, ZpC, Y, Z, Cout, jnp.dtype(dtype).itemsize,
                  padded_out=padded_out)
    return _zconv_pallas_raw(
        xpad2, Wb, bias_row, B=B, X=X, Y=Y, Z=Z, f=f, C=C, Cout=Cout,
        xt=xt, slope=slope, out_dtype=dtype, interpret=interpret,
        padded_out=padded_out,
    )


def _pick_f(z: int, c_in: int, cout: int) -> int:
    """Smallest z-block size that (a) divides z, (b) fills >= 128 output
    lanes, and (c) puts both input (f*c_in) and output (f*cout) block
    offsets on 128-lane boundaries. Returns 0 when impossible."""
    f = max(1, 128 // cout)
    while f <= z:
        if (z % f == 0 and f * cout >= 128
                and (f * c_in) % 128 == 0 and (f * cout) % 128 == 0):
            return f
        f *= 2
    return 0


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def zconv3d_leaky_folded(x4, kernel, bias, C: int, f: int,
                         slope: Optional[float], interpret: bool,
                         pre_padded: bool = False, padded_out: bool = False,
                         logical_yz=None):
    """LeakyReLU(conv3d_same + bias) on z-folded tensors, via the Pallas
    z-fold kernel. x4: (B, X, Y, Z*C); kernel: (3, 3, 3, C, Cout); returns
    (B, X, Y, Z*Cout). Grad flows to x4, kernel, bias — all gradient
    tensors also stay folded (5-D shapes at this boundary cost multi-GB
    padded layout copies).

    ``pre_padded``: x4 is already in the _pad_folded layout (halo must be
    zero); ``logical_yz=(Y, Z)`` then supplies the logical dims.
    ``padded_out``: emit the result in the _pad_folded layout (zero halo) so
    the next banded conv consumes it directly. The vjp mirrors the flags:
    with padded_out the incoming cotangent must carry a ZERO halo (a masked
    AdaIN between convs guarantees this), and with pre_padded the returned
    dx is itself in the padded layout with a zero halo."""
    return _fwd_folded(x4, kernel, bias, C, f, slope, interpret,
                       pre_padded, padded_out, logical_yz)


def _vjp_fwd(x4, kernel, bias, C, f, slope, interpret, pre_padded,
             padded_out, logical_yz):
    out = _fwd_folded(x4, kernel, bias, C, f, slope, interpret,
                      pre_padded, padded_out, logical_yz)
    return out, (x4, kernel, out, bias is not None)


def _vjp_bwd(C, f, slope, interpret, pre_padded, padded_out, logical_yz,
             res, dout):
    x4, kernel, out, had_bias = res
    if pre_padded:
        Y, Z = logical_yz
        B, X = x4.shape[0], x4.shape[1] - 2
    else:
        B, X, Y, ZC = x4.shape
        Z = ZC // C
    Cout = kernel.shape[-1]

    if slope is not None:
        # d LeakyReLU: the pre-activation sign equals the output sign
        # (in padded layouts the halo is 0 >= 0 and dout's halo is zero,
        # so the halo stays zero)
        g = jnp.where(out >= 0, dout, jnp.asarray(slope, dout.dtype) * dout)
    else:
        g = dout

    if had_bias:
        # reduce the big dims first; only the tiny (Z*Cout,) vector gets
        # reshaped (a (-1, Cout) view of the full tensor would cost a
        # 16x-padded 13.5 GB layout copy)
        lane_sums = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2))
        if padded_out:  # padded g: zero halo contributes nothing to the sums
            lane_sums = lane_sums[Cout:(Z + 1) * Cout]
        dbias = lane_sums.reshape(Z, Cout).sum(axis=0).astype(kernel.dtype)
    else:
        dbias = None

    # dx: adjoint conv = same banded kernel, spatially flipped, C<->Cout.
    # A padded cotangent (padded_out) is exactly the adjoint's _pad_folded
    # input, and a padded input (pre_padded) wants a padded dx — the flags
    # swap roles.
    kernel_adj = jnp.flip(kernel, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
    # full-z fold (zb=1, offset 0) is always alignment-safe as a fallback
    f_dx = _pick_f(Z, Cout, C) or Z
    dx = _fwd_folded(g, kernel_adj, None, Cout, f_dx, None, interpret,
                     pre_padded=padded_out, padded_out=pre_padded,
                     logical_yz=(Y, Z))

    # dW: banded weight gradient via the one-pass Pallas kernel (shared
    # weights: z-blocks accumulate into one (3, 3, fc_in, fco)), pulled
    # back through banded_weight's own vjp. ~(f+2)/3x more FLOPs than a
    # reduction conv on 5-D operands, but those operands would materialise
    # in 5.3x-padded layouts.
    xpad2 = x4 if pre_padded else _pad_folded(x4, C)[0]
    zb = Z // f
    fco = f * Cout
    fc_in = (f + 2) * C
    dWb = _dw_pallas(xpad2, g, B=B, X=X, Y=Y, fc_in=fc_in, fco=fco, zb=zb,
                     stride=f * C, per_block=False, interpret=interpret,
                     g_padded=padded_out, g_cout=Cout)
    _, band_vjp = jax.vjp(
        lambda k: banded_weight(k, f, jnp.float32), kernel.astype(jnp.float32)
    )
    (dW,) = band_vjp(dWb)
    return dx, dW.astype(kernel.dtype), dbias


zconv3d_leaky_folded.defvjp(_vjp_fwd, _vjp_bwd)


def zconv3d_leaky(x, kernel, bias, f: int, slope: Optional[float],
                  interpret: bool):
    """5-D convenience wrapper: (B, X, Y, Z, C) io around the folded op."""
    B, X, Y, Z, C = x.shape
    Cout = kernel.shape[-1]
    out4 = zconv3d_leaky_folded(
        x.reshape(B, X, Y, Z * C), kernel, bias, C, f, slope, interpret)
    return out4.reshape(B, X, Y, Z, Cout)


# ---------------------------------------------------------------------------
# Fused 2x z-upsample + conv: the trilinear z-interpolation composes into the
# banded weight (out z-block of f big-z values reads f//2 + 2 small-z slices
# instead of f + 2 big-z ones), nearly halving the conv contraction and
# removing the separate z-interp matmul. x/y upsampling stays a folded resize
# before the kernel, so its traffic also halves (small-z lanes).
# ---------------------------------------------------------------------------
def _pick_f_up(zs: int, c_in: int, cout: int) -> int:
    """Big-z block size for the fused kernel: divides 2*zs, fills >= 128
    output lanes, with both the small-z window stride ((f//2)*c_in) and the
    output stride (f*cout) on 128-lane boundaries. 0 when impossible."""
    f = max(2, 128 // cout)
    while f <= 2 * zs:
        if (f % 2 == 0 and (2 * zs) % f == 0 and f * cout >= 128
                and (f * cout) % 128 == 0
                and ((f // 2) * c_in) % 128 == 0):
            return f
        f *= 2
    return 0


def _pick_fp_up(zs: int, c_in: int, cout: int) -> int:
    """Small-z block size for the adjoint: divides zs, >= 128 output lanes
    (fp*c_in), grad window stride (2*fp*cout) on 128-lane boundaries."""
    fp = max(1, 128 // c_in)
    while fp <= zs:
        if (zs % fp == 0 and fp * c_in >= 128 and (fp * c_in) % 128 == 0
                and (2 * fp * cout) % 128 == 0):
            return fp
        fp *= 2
    return 0


def _fwd_up_folded(x4, kernel, bias, C: int, f: int, slope: Optional[float],
                   interpret: bool, padded_out: bool = False):
    """x4: (B, X, Y, Zs*C) with X, Y already 2x-upsampled; returns
    (B, X, Y, 2*Zs*Cout) — trilinear z-upsample + conv + bias + leaky.
    ``padded_out``: emit the result in the _pad_folded layout (zero halo)."""
    B, X, Y, ZsC = x4.shape
    Zs = ZsC // C
    Z = 2 * Zs
    Cout = kernel.shape[-1]
    dtype = x4.dtype
    xpad2, Yp, Zp = _pad_folded(x4, C)
    W2 = up_banded_weight(kernel, Zs, f, dtype)
    if padded_out:
        # pre-roll each block's output lanes by +Cout (see _zconv_pallas_raw)
        W2 = jnp.roll(W2, Cout, axis=-1)
    bias_row = None
    if bias is not None:
        bias_row = jnp.tile(bias.astype(dtype), (f,)).reshape(1, f * Cout)
    xt = _pick_xt(X, Yp, Zp * C, Y, Z, Cout, jnp.dtype(dtype).itemsize,
                  padded_out=padded_out)
    return _zconv_pallas_raw(
        xpad2, W2, bias_row, B=B, X=X, Y=Y, Z=Z, f=f, C=C, Cout=Cout,
        xt=xt, slope=slope, out_dtype=dtype, interpret=interpret,
        stride_lanes=(f // 2) * C, padded_out=padded_out,
    )


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def upzconv3d_leaky_folded(x4, kernel, bias, C: int, f: int,
                           slope: Optional[float], interpret: bool,
                           padded_out: bool = False):
    """LeakyReLU(conv3d_same(trilinear_up_z(x)) + bias), fused. x4 must be
    x/y-upsampled, z-folded (B, X, Y, Zs*C); output (B, X, Y, 2*Zs*Cout).

    ``padded_out`` emits the output in the _pad_folded layout (zero halo),
    ready for a pre_padded zconv3d_leaky_folded to consume; the incoming
    cotangent must then carry a ZERO halo (masked AdaIN guarantees it)."""
    return _fwd_up_folded(x4, kernel, bias, C, f, slope, interpret,
                          padded_out)


def _up_vjp_fwd(x4, kernel, bias, C, f, slope, interpret, padded_out):
    out = _fwd_up_folded(x4, kernel, bias, C, f, slope, interpret,
                         padded_out)
    return out, (x4, kernel, out, bias is not None)


def _up_vjp_bwd(C, f, slope, interpret, padded_out, res, dout):
    x4, kernel, out, had_bias = res
    B, X, Y, ZsC = x4.shape
    Zs = ZsC // C
    Z = 2 * Zs
    Cout = kernel.shape[-1]
    dtype = x4.dtype

    if slope is not None:
        # halo (padded_out): out = 0 >= 0 picks dout's zero halo — stays 0
        g = jnp.where(out >= 0, dout, jnp.asarray(slope, dout.dtype) * dout)
    else:
        g = dout

    if had_bias:
        lane_sums = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2))
        if padded_out:  # padded g: zero halo contributes nothing
            lane_sums = lane_sums[Cout:(Z + 1) * Cout]
        dbias = lane_sums.reshape(Z, Cout).sum(axis=0).astype(kernel.dtype)
    else:
        dbias = None

    # dx: adjoint of (upsample_z ∘ conv): per-block banded over big-z grads.
    # The adjoint window is front-padded by TWO big-z slices (its z = -2
    # tap is genuinely nonzero, and front=2 keeps the per-block window
    # reads 128-lane-aligned); a padded g (front halo of one) lane-shifts
    # by Cout in one fused pad+slice — the only full-tensor copy left on
    # this path (a DMA-side or read-side shift would land on unaligned
    # tiled offsets, which Mosaic rejects / the VPU pays relayouts for).
    fp = _pick_fp_up(Zs, C, Cout) or Zs
    Wadj = up_banded_adjoint_weight(kernel, Zs, fp, dtype)
    if padded_out:
        import math

        Yp = g.shape[2]
        Zp1 = g.shape[3] // Cout
        zstep = 128 // math.gcd(Cout, 128)
        Zp2 = _round_up(Z + 4, zstep)
        gpad2 = jnp.pad(
            g, ((0, 0), (0, 0), (0, 0),
                (Cout, max(0, (Zp2 - Zp1 - 1)) * Cout)))[..., :Zp2 * Cout]
    else:
        gpad2, Yp, _ = _pad_folded(g, Cout, front=2, min_tail=2)
    ZpC_g = gpad2.shape[3]
    xt = _pick_xt(X, Yp, ZpC_g, Y, Zs, C, jnp.dtype(dtype).itemsize)
    dx = _zconv_pallas_raw(
        gpad2, Wadj, None, B=B, X=X, Y=Y, Z=Zs, f=fp, C=Cout, Cout=C,
        xt=xt, slope=None, out_dtype=dtype, interpret=interpret,
        stride_lanes=2 * fp * Cout,
    )

    # dW: per-block banded gradients via the one-pass Pallas kernel,
    # pulled back through the fused-upsample weight builder (a padded g is
    # read in place — no unpad pass)
    xpad2, _, _ = _pad_folded(x4, C)
    zb = Z // f
    fs = f // 2 + 2
    fco = f * Cout
    fc_in = fs * C
    dW2 = _dw_pallas(xpad2, g, B=B, X=X, Y=Y, fc_in=fc_in, fco=fco, zb=zb,
                     stride=(f // 2) * C, per_block=True,
                     interpret=interpret, g_padded=padded_out, g_cout=Cout)
    _, band_vjp = jax.vjp(
        lambda k: up_banded_weight(k, Zs, f, jnp.float32),
        kernel.astype(jnp.float32))
    (dW,) = band_vjp(dW2)
    return dx, dW.astype(kernel.dtype), dbias


upzconv3d_leaky_folded.defvjp(_up_vjp_fwd, _up_vjp_bwd)


def pallas_upzconv_available(zs: int, c_in: int, cout: int,
                             x_dim: int) -> bool:
    """Shapes fit the fused upsample+conv kernel and its adjoint.

    (No X-tile condition: _pick_xt always returns a divisor of X, falling
    back to xt=1, so any X is tileable.)"""
    del x_dim
    return (2 * zs > 18
            and _pick_f_up(zs, c_in, cout) > 2
            and _pick_fp_up(zs, c_in, cout) > 0)


def pallas_zconv_available(z: int, c_in: int, cout: int, x_dim: int) -> bool:
    """The kernel (and its adjoint for dx) need z divisible into
    lane-filling blocks with 128-aligned offsets. (No X-tile condition:
    _pick_xt always returns a divisor of X, falling back to xt=1.)"""
    del x_dim
    return (z > 18
            and _pick_f(z, c_in, cout) > 2
            and _pick_f(z, cout, c_in) > 2)
