#!/usr/bin/env python
"""Matmul microbenchmark: f32 vs int8 batched matmuls across sizes.

TPU equivalent of the reference's numpy-vs-torch matmul benchmark
(reference: extra/numpy_matmul_benchmark.py:10-70): times the
(16, 12, n, n) batched matmul that dominates transformer attention, in
float32 (HIGHEST precision) and int8-with-int32-accumulation, printing
an ASCII comparison instead of plotext.
"""
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def bench_chained(step, a0, iters=10):
    out = step(a0)
    import jax
    jax.block_until_ready(out)
    a = a0
    t0 = time.time()
    for _ in range(iters):
        a = step(a)
    jax.block_until_ready(a)
    return (time.time() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    batch = (16, 12)
    sizes = [25, 50, 75, 100, 125, 150, 175, 256, 512]
    rows = []
    for n in sizes:
        a = jnp.asarray(np.random.default_rng(0).standard_normal(
            (*batch, n, n)).astype(np.float32))
        a8 = jnp.asarray(np.random.default_rng(0).integers(
            -127, 128, (*batch, n, n)), jnp.int8)

        @jax.jit
        def f32_step(x, _n=n):
            y = jnp.matmul(x, x, precision=jax.lax.Precision.HIGHEST)
            return y * (1.0 / _n)

        @jax.jit
        def i8_step(x):
            y = jnp.matmul(x, x, preferred_element_type=jnp.int32)
            return (y & 63).astype(jnp.int8)

        tf = bench_chained(f32_step, a)
        ti = bench_chained(i8_step, a8)
        flops = 2 * batch[0] * batch[1] * n ** 3
        rows.append((n, tf * 1e3, flops / tf / 1e12, ti * 1e3, flops / ti / 1e12))

    print(f"{'n':>5} | {'f32 ms':>8} {'TF/s':>6} | {'int8 ms':>8} {'TOP/s':>6}")
    for n, tf, gf, ti, gi in rows:
        print(f"{n:>5} | {tf:8.3f} {gf:6.1f} | {ti:8.3f} {gi:6.1f}")


if __name__ == "__main__":
    main()
