"""Measure whether the MXU runs contraction-dim k<128 matmuls faster than
k=128 (it should not: the systolic array streams M rows at a fixed rate with
the (k, n) weight tile resident, so pass time is k-independent below 128).

*** UNRELIABLE OVER THE AXON TUNNEL — use tools/pallas_smalld_microbench.py
*** instead. This pure-XLA chain reads multiples of the chip's bf16 peak on
*** the tunnel even with fresh inputs per call: the normalize-feedback chain
*** is power iteration, converges to bit-identical values within ~20 iters,
*** and value-identical work is served without executing (measured: chain(64)
*** and chain(320) both ≈ RTT, with REAL distinct outputs). The r4-recorded
*** t32/t128 = 0.28 came from the older inf-saturating variant of the same
*** pathology and is WRONG. The in-kernel Pallas chain (which does not get
*** value-served) measures t(d=32)/t(d=128) = 0.98 at the flash shapes:
*** MXU pass time IS k-independent below 128 — the 4x padded-FLOPs factor
*** for d_head=32 attention is architectural, as r3 originally concluded.

On real (non-tunneled) hardware this tool remains meaningful:
if t(k=32) ≈ t(k=128), no lane-packing scheme can beat the 4x padded-FLOPs
factor — any dense matmul computing per-head scores must place the other
heads' lanes as zeros somewhere, and zero operand lanes cost full MXU time.

Run: python tools/mxu_smallk_microbench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from muvo_tpu.utils.jax_setup import setup_jax  # noqa: E402

setup_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def bench(k, m, n, key, short=64, long=320):
    # Measurement on the axon tunnel (see pallas_smalld_microbench.py for
    # the full story): a persistent result cache serves value-identical
    # repeats, block_until_ready on un-fetched independent results returns
    # in ~25 us without waiting, and a host fetch pays ~30 ms RTT. The
    # only reliable pattern is an ON-DEVICE dependency chain inside one
    # jit — lax.scan feeding the normalized output back as `a` — timed at
    # two lengths and differenced to cancel RTT + dispatch.
    import numpy as np

    def chain(iters):
        @jax.jit
        def run(a, b):
            def body(ac, _):
                out = jax.lax.dot_general(
                    ac, b, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                nxt = (out[:, :k] / jnp.maximum(
                    jnp.max(jnp.abs(out[:, :k])), 1e-6)).astype(ac.dtype)
                return nxt, ()
            af, _ = jax.lax.scan(body, a, None, length=iters)
            return af
        return run

    b = jax.random.normal(jax.random.fold_in(key, k + 1), (k, n),
                          jnp.bfloat16)
    seq = iter(range(10_000))

    def timed(f):
        # fresh `a` per call: even whole-chain results get served from the
        # value cache when the full argument tuple repeats
        a = jax.random.normal(jax.random.fold_in(key, 17 + next(seq)),
                              (m, k), jnp.bfloat16)
        jax.block_until_ready(a)
        t0 = time.perf_counter()
        np.asarray(f(a, b)[0, :4])
        return time.perf_counter() - t0

    fs, fl = chain(short), chain(long)
    timed(fs), timed(fl)  # compile
    t_s = min(timed(fs) for _ in range(3))
    t_l = min(timed(fl) for _ in range(3))
    return (t_l - t_s) / (long - short)


def main():
    m, n = 32768, 4096  # per-iter k=128 work = 0.17 ms at peak: unambiguous vs overhead
    key = jax.random.PRNGKey(0)
    results = {}
    for k in (32, 64, 128, 256):
        t = bench(k, m, n, key)
        results[k] = t
        eff_tf = 2 * m * n * k / t / 1e12
        print(f"k={k:4d}: {t * 1e3:7.3f} ms  useful {eff_tf:6.1f} TFLOP/s")
    print(f"\nt(k=32)/t(k=128) = {results[32] / results[128]:.2f} "
          "(≈1.0 → k<128 is free time-wise → 4x pad waste is architectural; "
          "≈0.25 → head-packing would pay)")


if __name__ == "__main__":
    main()
