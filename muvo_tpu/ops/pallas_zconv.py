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
    block of fp small-z inputs; spatial taps flipped, channels swapped."""
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


def _zconv_pallas_raw(xpad2, Wb, bias_row, *, B, X, Y, Z, f, C, Cout, xt,
                      slope: Optional[float], out_dtype, interpret: bool,
                      stride_lanes: Optional[int] = None):
    """xpad2: (B, X+2, Yp, Zp*C) — Y and Z*C padded so the tiled (sublane,
    lane) dims of every DMA slice are (8, 128)-aligned. Wb: (3, 3, (f+2)C,
    f*Cout) shared, or (zb, 3, 3, win, f*Cout) per-block; bias_row:
    (1, f*Cout) or None. Returns (B, X, Y, Z*Cout).

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

    has_bias = bias_row is not None

    def kernel(xpad_ref, wb_ref, *rest):
        if has_bias:
            bias_ref, out_ref, scratch, sem = rest
        else:
            out_ref, scratch, sem = rest
        i = pl.program_id(0)

        def dma(step, slot):
            xi = jax.lax.rem(step, nX)
            b = step // nX
            return pltpu.make_async_copy(
                xpad_ref.at[b, pl.ds(xi * xt, xt + 2), :, :],
                scratch.at[slot],
                sem.at[slot],
            )

        slot = jax.lax.rem(i, 2)

        @pl.when(i == 0)
        def _():
            dma(i, slot).start()

        @pl.when(i + 1 < N)
        def _():
            dma(i + 1, 1 - slot).start()

        dma(i, slot).wait()
        tile = scratch[slot]  # (xt+2, Yp, Zp*C)

        for zbi in range(zb):
            off = zbi * stride  # multiple of 128 by construction
            acc = jnp.zeros((xt * Y, fco), jnp.float32)
            for dx in range(3):
                for dy in range(3):
                    win = tile[dx:dx + xt, dy:dy + Y, off:off + fc_in]
                    w = wb_ref[zbi, dx, dy] if per_block else wb_ref[dx, dy]
                    acc = acc + jnp.dot(
                        win.reshape(xt * Y, fc_in), w,
                        preferred_element_type=jnp.float32)
            if has_bias:
                acc = acc + bias_ref[:].astype(jnp.float32)
            if slope is not None:
                acc = jnp.where(acc >= 0, acc, slope * acc)
            out_ref[0, :, :, zbi * fco:(zbi + 1) * fco] = (
                acc.reshape(xt, Y, fco).astype(out_dtype))

    def out_index(i):
        return (i // nX, jax.lax.rem(i, nX), 0, 0)

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    operands = [xpad2, Wb]
    if has_bias:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        operands.append(bias_row)

    return pl.pallas_call(
        kernel,
        grid=(N,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, xt, Y, Z * Cout), out_index,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, X, Y, Z * Cout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, xt + 2, Yp, ZpC), xpad2.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * zb * X * Y * 9 * fc_in * fco,
            bytes_accessed=xpad2.size * xpad2.dtype.itemsize
            + B * X * Y * Z * Cout * 2,
            transcendentals=0,
        ),
    )(*operands)


def _dw_pallas(xpad2, g, *, B, X, Y, fc_in, fco, zb, stride, per_block,
               interpret):
    """Banded weight gradient in one pass: dW[(zbi,)dxi,dyi] = win^T @ g.

    Replaces the dynamic_slice+einsum loop, which materialised a full
    (B, X, Y, fc_in) window copy per (tap, z-block) — ~46 GB of HBM traffic
    on the flagship voxel conv3 (measured 2 x 37.8 ms/step). Here each
    (b, x-stripe) is DMA'd once (double-buffered, same stripe walk as the
    forward kernel) and all zb*9 tap gradients accumulate in a VMEM
    scratch-resident output block.

    xpad2: (B, X+2, Yp, ZpC); g: (B, X, Y, zb*fco).
    Returns f32 (zb, 3, 3, fc_in, fco) when per_block else (3, 3, fc_in, fco).
    """
    Yp, ZpC = xpad2.shape[2], xpad2.shape[3]
    ZCo = g.shape[3]
    itemsize = jnp.dtype(xpad2.dtype).itemsize
    out_shape = ((zb, 3, 3, fc_in, fco) if per_block
                 else (3, 3, fc_in, fco))
    dw_bytes = 4 * zb * 9 * fc_in * fco if per_block else 4 * 9 * fc_in * fco

    budget = 26 * 1024 * 1024
    xt = 1
    for cand in (8, 4, 2, 1):
        if X % cand != 0:
            continue
        foot = (2 * (cand + 2) * Yp * ZpC * itemsize
                + 2 * cand * Y * ZCo * itemsize + dw_bytes
                + cand * Y * max(fc_in, fco) * 4)
        if foot <= budget:
            xt = cand
            break
    nX = X // xt
    N = B * nX

    def kernel(x_ref, g_ref, out_ref, xs, gs, xsem, gsem):
        i = pl.program_id(0)

        def dma_x(step, slot):
            xi = jax.lax.rem(step, nX)
            b = step // nX
            return pltpu.make_async_copy(
                x_ref.at[b, pl.ds(xi * xt, xt + 2), :, :],
                xs.at[slot], xsem.at[slot])

        def dma_g(step, slot):
            xi = jax.lax.rem(step, nX)
            b = step // nX
            return pltpu.make_async_copy(
                g_ref.at[b, pl.ds(xi * xt, xt), :, :],
                gs.at[slot], gsem.at[slot])

        slot = jax.lax.rem(i, 2)

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
        g_t = gs[slot]   # (xt, Y, zb*fco)

        for zbi in range(zb):
            off = zbi * stride  # 128-multiple by construction
            go = g_t[:, :, zbi * fco:(zbi + 1) * fco].reshape(xt * Y, fco)
            for dxi in range(3):
                for dyi in range(3):
                    win = x_t[dxi:dxi + xt, dyi:dyi + Y,
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
    return pl.pallas_call(
        kernel,
        grid=(N,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(out_shape, out_index,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, xt + 2, Yp, ZpC), xpad2.dtype),
            pltpu.VMEM((2, xt, Y, ZCo), g.dtype),
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


def _pick_xt(X: int, Yp: int = 0, ZpC: int = 0, Y: int = 0, Z: int = 0,
             cout: int = 0, itemsize: int = 2) -> int:
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
        out = 2 * xt * Y * Z * cout * itemsize
        acc = xt * Y * 128 * 4 * 2
        if scratch + out + acc <= budget:
            return xt
    return 1


def _pad_folded(x4, C: int, front: int = 1, min_tail: int = 1):
    """4-D pad for the kernel: +1 x/y ring, a z-halo of ``front`` zero
    slices in front, and tail zeros to align the tiled (sublane, lane)
    dims to (8, 128). Everything stays in the folded row-major domain — a
    5-D pad here drew a 5.3x-padded layout from XLA (measured 10.7 GB on
    the flagship step)."""
    import math

    B, X, Y, ZC = x4.shape
    Z = ZC // C
    Yp = _round_up(Y + 2, 8)
    zstep = 128 // math.gcd(C, 128)
    Zp = _round_up(Z + front + min_tail, zstep)
    xpad = jnp.pad(x4, ((0, 0), (1, 1), (1, Yp - Y - 1),
                        (front * C, (Zp - Z - front) * C)))
    return xpad, Yp, Zp


def _fwd_folded(x4, kernel, bias, C: int, f: int, slope: Optional[float],
                interpret: bool):
    """x4: (B, X, Y, Z*C) folded; returns (B, X, Y, Z*Cout) folded."""
    B, X, Y, ZC = x4.shape
    Z = ZC // C
    Cout = kernel.shape[-1]
    dtype = x4.dtype
    xpad2, Yp, Zp = _pad_folded(x4, C)
    Wb = banded_weight(kernel, f, dtype)
    bias_row = None
    if bias is not None:
        bias_row = jnp.tile(bias.astype(dtype), (f,)).reshape(1, f * Cout)
    xt = _pick_xt(X, Yp, Zp * C, Y, Z, Cout, jnp.dtype(dtype).itemsize)
    return _zconv_pallas_raw(
        xpad2, Wb, bias_row, B=B, X=X, Y=Y, Z=Z, f=f, C=C, Cout=Cout,
        xt=xt, slope=slope, out_dtype=dtype, interpret=interpret,
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


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def zconv3d_leaky_folded(x4, kernel, bias, C: int, f: int,
                         slope: Optional[float], interpret: bool):
    """LeakyReLU(conv3d_same + bias) on z-folded tensors, via the Pallas
    z-fold kernel. x4: (B, X, Y, Z*C); kernel: (3, 3, 3, C, Cout); returns
    (B, X, Y, Z*Cout). Grad flows to x4, kernel, bias — all gradient
    tensors also stay folded (5-D shapes at this boundary cost multi-GB
    padded layout copies)."""
    return _fwd_folded(x4, kernel, bias, C, f, slope, interpret)


def _vjp_fwd(x4, kernel, bias, C, f, slope, interpret):
    out = _fwd_folded(x4, kernel, bias, C, f, slope, interpret)
    return out, (x4, kernel, out, bias is not None)


def _vjp_bwd(C, f, slope, interpret, res, dout):
    x4, kernel, out, had_bias = res
    B, X, Y, ZC = x4.shape
    Z = ZC // C
    Cout = kernel.shape[-1]

    if slope is not None:
        # d LeakyReLU: the pre-activation sign equals the output sign
        g = jnp.where(out >= 0, dout, jnp.asarray(slope, dout.dtype) * dout)
    else:
        g = dout

    if had_bias:
        # reduce the big dims first; only the tiny (Z*Cout,) vector gets
        # reshaped (a (-1, Cout) view of the full tensor would cost a
        # 16x-padded 13.5 GB layout copy)
        lane_sums = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2))
        dbias = lane_sums.reshape(Z, Cout).sum(axis=0).astype(kernel.dtype)
    else:
        dbias = None

    # dx: adjoint conv = same banded kernel, spatially flipped, C<->Cout
    kernel_adj = jnp.flip(kernel, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
    # full-z fold (zb=1, offset 0) is always alignment-safe as a fallback
    f_dx = _pick_f(Z, Cout, C) or Z
    dx = _fwd_folded(g, kernel_adj, None, Cout, f_dx, None, interpret)

    # dW: banded weight gradient via the one-pass Pallas kernel (shared
    # weights: z-blocks accumulate into one (3, 3, fc_in, fco)), pulled
    # back through banded_weight's own vjp. ~(f+2)/3x more FLOPs than a
    # reduction conv on 5-D operands, but those operands would materialise
    # in 5.3x-padded layouts.
    xpad2, _, _ = _pad_folded(x4, C)
    zb = Z // f
    fco = f * Cout
    fc_in = (f + 2) * C
    dWb = _dw_pallas(xpad2, g, B=B, X=X, Y=Y, fc_in=fc_in, fco=fco, zb=zb,
                     stride=f * C, per_block=False, interpret=interpret)
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
                   interpret: bool):
    """x4: (B, X, Y, Zs*C) with X, Y already 2x-upsampled; returns
    (B, X, Y, 2*Zs*Cout) — trilinear z-upsample + conv + bias + leaky."""
    B, X, Y, ZsC = x4.shape
    Zs = ZsC // C
    Z = 2 * Zs
    Cout = kernel.shape[-1]
    dtype = x4.dtype
    xpad2, Yp, Zp = _pad_folded(x4, C)
    W2 = up_banded_weight(kernel, Zs, f, dtype)
    bias_row = None
    if bias is not None:
        bias_row = jnp.tile(bias.astype(dtype), (f,)).reshape(1, f * Cout)
    xt = _pick_xt(X, Yp, Zp * C, Y, Z, Cout, jnp.dtype(dtype).itemsize)
    return _zconv_pallas_raw(
        xpad2, W2, bias_row, B=B, X=X, Y=Y, Z=Z, f=f, C=C, Cout=Cout,
        xt=xt, slope=slope, out_dtype=dtype, interpret=interpret,
        stride_lanes=(f // 2) * C,
    )


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def upzconv3d_leaky_folded(x4, kernel, bias, C: int, f: int,
                           slope: Optional[float], interpret: bool):
    """LeakyReLU(conv3d_same(trilinear_up_z(x)) + bias), fused. x4 must be
    x/y-upsampled, z-folded (B, X, Y, Zs*C); output (B, X, Y, 2*Zs*Cout)."""
    return _fwd_up_folded(x4, kernel, bias, C, f, slope, interpret)


def _up_vjp_fwd(x4, kernel, bias, C, f, slope, interpret):
    out = _fwd_up_folded(x4, kernel, bias, C, f, slope, interpret)
    return out, (x4, kernel, out, bias is not None)


def _up_vjp_bwd(C, f, slope, interpret, res, dout):
    x4, kernel, out, had_bias = res
    B, X, Y, ZsC = x4.shape
    Zs = ZsC // C
    Z = 2 * Zs
    Cout = kernel.shape[-1]
    dtype = x4.dtype

    if slope is not None:
        g = jnp.where(out >= 0, dout, jnp.asarray(slope, dout.dtype) * dout)
    else:
        g = dout

    if had_bias:
        lane_sums = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2))
        dbias = lane_sums.reshape(Z, Cout).sum(axis=0).astype(kernel.dtype)
    else:
        dbias = None

    # dx: adjoint of (upsample_z ∘ conv): per-block banded over big-z grads
    fp = _pick_fp_up(Zs, C, Cout) or Zs
    Wadj = up_banded_adjoint_weight(kernel, Zs, fp, dtype)
    gpad2, Yp, _ = _pad_folded(g, Cout, front=2, min_tail=2)
    ZpC_g = gpad2.shape[3]
    xt = _pick_xt(X, Yp, ZpC_g, Y, Zs, C, jnp.dtype(dtype).itemsize)
    dx = _zconv_pallas_raw(
        gpad2, Wadj, None, B=B, X=X, Y=Y, Z=Zs, f=fp, C=Cout, Cout=C,
        xt=xt, slope=None, out_dtype=dtype, interpret=interpret,
        stride_lanes=2 * fp * Cout,
    )

    # dW: per-block banded gradients via the one-pass Pallas kernel,
    # pulled back through the fused-upsample weight builder
    xpad2, _, _ = _pad_folded(x4, C)
    zb = Z // f
    fs = f // 2 + 2
    fco = f * Cout
    fc_in = fs * C
    dW2 = _dw_pallas(xpad2, g, B=B, X=X, Y=Y, fc_in=fc_in, fco=fco, zb=zb,
                     stride=(f // 2) * C, per_block=True,
                     interpret=interpret)
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
