"""In-kernel Mosaic timing for the flash-attention block shapes at
d_head=32 vs the zero-padded d=128 form.

Measurement notes (hard-won on the axon tunnel — r5):
  * A persistent result cache serves value-identical repeated executions
    (executable + input values), so naive repeat loops AND output-feedback
    chains that saturate to inf both read as multiples of the chip's bf16
    peak (r4 recorded 1134/4560 "TF/s").
  * `block_until_ready` on an un-fetched result of an INDEPENDENT call
    returns in ~25 us regardless of the kernel's size — it does not wait
    for remote execution — and a host fetch pays a ~30 ms tunnel RTT,
    swamping sub-ms kernels.
  * The reliable pattern: chain ITERS kernel executions ON DEVICE inside
    one jit (lax.scan feeding the normalized output back as q, so every
    iteration depends on the previous and values stay finite), fetch one
    element, and difference two chain lengths to cancel the RTT and the
    per-call overhead.

Run on the real chip: python tools/pallas_smalld_microbench.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from muvo_tpu.utils.jax_setup import setup_jax  # noqa: E402

setup_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

BQ = BK = 512


def _kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, *, d):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    p = s.astype(v.dtype)  # stand-in for softmax (same MXU work as flash)
    acc_ref[...] += jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _flush():
        o_ref[0] = acc_ref[...].astype(o_ref.dtype)


def build(d, bh, n):
    grid = (bh, n // BQ, n // BK)

    def run(q, k, v):
        return pl.pallas_call(
            functools.partial(_kernel, d=d),
            out_shape=jax.ShapeDtypeStruct((bh, n, d), q.dtype),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((1, BQ, d), lambda b, i, j: (b, i, 0)),
                    pl.BlockSpec((1, BK, d), lambda b, i, j: (b, j, 0)),
                    pl.BlockSpec((1, BK, d), lambda b, i, j: (b, j, 0)),
                ],
                out_specs=pl.BlockSpec((1, BQ, d), lambda b, i, j: (b, i, 0)),
                scratch_shapes=[pltpu.VMEM((BQ, d), jnp.float32)],
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
        )(q, k, v)

    return run


def build_chain(d, bh, n, iters):
    run = build(d, bh, n)

    @jax.jit
    def chained(q, k, v):
        def body(qc, _):
            o = run(qc, k, v)
            # normalize so the chain never saturates (finite, distinct
            # values each iteration -> no result-cache hit, real dataflow
            # dependency -> device executes every link)
            qn = (o / jnp.maximum(jnp.max(jnp.abs(o)), 1e-6)).astype(q.dtype)
            return qn, ()
        qf, _ = jax.lax.scan(body, q, None, length=iters)
        return qf

    return chained


_SEQ = iter(range(10_000))


def timed_fetch(f, key, bh, n, d, k, v):
    # fresh q per call: even whole-chain results get served from the value
    # cache when the full argument tuple repeats
    q = jax.random.normal(jax.random.fold_in(key, 17 + next(_SEQ)),
                          (bh, n, d), jnp.bfloat16)
    jax.block_until_ready(q)
    t0 = time.perf_counter()
    out = f(q, k, v)
    np.asarray(out[0, 0, :4])  # force the round-trip
    return time.perf_counter() - t0


def main():
    bh, n = 16, 5632  # LARGE-path shape (batch 2 x 8 heads, padded tokens)
    key = jax.random.PRNGKey(0)
    short, long = 32, 160
    ts = {}
    for d in (32, 128):
        k = jax.random.normal(jax.random.fold_in(key, d + 1), (bh, n, d),
                              jnp.bfloat16)
        v = jax.random.normal(jax.random.fold_in(key, d + 2), (bh, n, d),
                              jnp.bfloat16)
        fs = build_chain(d, bh, n, short)
        fl = build_chain(d, bh, n, long)
        timed_fetch(fs, key, bh, n, d, k, v)  # warmup/compile
        timed_fetch(fl, key, bh, n, d, k, v)
        t_s = min(timed_fetch(fs, key, bh, n, d, k, v) for _ in range(3))
        t_l = min(timed_fetch(fl, key, bh, n, d, k, v) for _ in range(3))
        t = (t_l - t_s) / (long - short)  # per-kernel, RTT cancelled
        ts[d] = t
        # useful = s (2 n^2 d) + pv (2 n^2 d) per bh
        tf = 4 * bh * n * n * d / t / 1e12
        print(f"d={d:4d}: {t * 1e3:8.3f} ms  useful {tf:6.1f} TFLOP/s")
    print(f"\nt(d=32)/t(d=128) = {ts[32] / ts[128]:.2f} "
          "(≈0.25-0.35 → drop the host-side d padding in the flash "
          "kernels; ≈1.0 → Mosaic pads k to 128 anyway, keep as is)")


if __name__ == "__main__":
    main()
