"""Measure whether the MXU runs contraction-dim k<128 matmuls faster than
k=128 (it should not: the systolic array streams M rows at a fixed rate with
the (k, n) weight tile resident, so pass time is k-independent below 128).

This settles VERDICT r3's head-packing suggestion for the LARGE-path flash
attention (d_head=32, reference mile.py:96-101) empirically: if t(k=32) ≈
t(k=128), no lane-packing scheme can beat the 4x padded-FLOPs factor —
any dense matmul computing the per-head scores must place the other heads'
lanes as zeros somewhere, and zero operand lanes cost full MXU time.

Run on the real chip: python tools/mxu_smallk_microbench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from muvo_tpu.utils.jax_setup import setup_jax  # noqa: E402

setup_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def bench(f, a, b, iters=50):
    # output feeds the next input: identical repeated executions are served
    # from a result cache by the axon client (3x-over-peak "throughput"
    # otherwise) — chaining forces every iteration to execute
    k = a.shape[1]
    out = f(a, b)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(out[:, :k].astype(a.dtype), b)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    m = n = 4096
    key = jax.random.PRNGKey(0)
    results = {}
    for k in (32, 64, 128, 256):
        a = jax.random.normal(key, (m, k), jnp.bfloat16)
        b = jax.random.normal(key, (k, n), jnp.bfloat16)
        f = jax.jit(lambda a, b: jax.lax.dot_general(  # noqa: B023
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
        t = bench(f, a, b)
        results[k] = t
        eff_tf = 2 * m * n * k / t / 1e12
        print(f"k={k:4d}: {t * 1e3:7.3f} ms  useful {eff_tf:6.1f} TFLOP/s")
    print(f"\nt(k=32)/t(k=128) = {results[32] / results[128]:.2f} "
          "(≈1.0 → k<128 is free time-wise → 4x pad waste is architectural; "
          "≈0.25 → head-packing would pay)")


if __name__ == "__main__":
    main()
