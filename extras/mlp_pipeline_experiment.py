"""MLP mega-fusion: XLA's fused chain vs a VMEM-resident Pallas MLP.

ROADMAP floor #1 names ONE untried lever for the headline bench's
executed-MXU (50.2%): Mosaic-level pipelining of the MLP mega-fusion
(fc1 -> GELU -> quantize -> fc2), measured at 77% of int8 dot peak.
XLA necessarily materializes the [tokens, intermediate] bf16 tensor
between the two dots (~116 MB at batch 96 -- the two dots cannot fuse
into one kernel), paying ~230 MB/layer of HBM traffic. The Pallas
candidate keeps BOTH weight matrices resident in VMEM (2x 2.3 MB int8)
and streams token tiles through the whole chain -- the intermediate
lives only in VMEM, the x tiles double-buffer under Mosaic's grid
pipeline, and the MXU sees two back-to-back int8 dots per tile.

Run on the chip; prints one JSON line per variant (ms/layer at the
bench shape) and the verdict. Numerics here mirror the bench chain's
structure (int8 dots + zp-correction colsums, bf16 sigmoid-form GELU,
rint/clip requantize) with synthetic scales -- close enough that the
timing transfers; exact integration follows only if the timing wins
(BENCH_HISTORY round-5 entry records the outcome).
"""
import functools
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BATCH = int(os.environ.get("NQ_TPU_BENCH_BATCH", "96"))
SEQ, K, N = 197, 768, 3072
LAYERS = 12


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("NQ_TPU_JAX_CACHE",
                                     "/tmp/nq_tpu_jaxcache"))

    M = BATCH * SEQ
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    w1 = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
    w2 = jnp.asarray(rng.integers(-127, 128, (N, K)), jnp.int8)
    cs1 = jnp.asarray(np.asarray(w1, np.int32).sum(0, keepdims=True))
    cs2 = jnp.asarray(np.asarray(w2, np.int32).sum(0, keepdims=True))
    b1 = jnp.asarray(rng.normal(size=(1, N)), jnp.float32) * 0.1
    b2 = jnp.asarray(rng.normal(size=(1, K)), jnp.float32) * 0.1
    s1, s2 = np.float32(3e-4), np.float32(2e-4)
    sh, zh = np.float32(0.05), np.int32(3)
    sx, zx = np.float32(0.04), np.int32(-2)
    K1 = np.float32(1.5957692)       # sigmoid-form GELU coefficients
    K3 = np.float32(0.07135648)

    def gelu_bf16(h):
        # explicit dtype-matched constants: Mosaic rejects f32-scalar
        # broadcasts into bf16 vectors (jax.nn.sigmoid's internals)
        hf = h.astype(jnp.bfloat16)
        k1 = jnp.asarray(K1, jnp.bfloat16)
        k3 = jnp.asarray(K3, jnp.bfloat16)
        one = jnp.asarray(1.0, jnp.bfloat16)
        z = k1 * hf + k3 * hf * hf * hf
        return hf * (one / (one + jnp.exp(-z)))

    def quant(h, s, z, dtype=jnp.int8):
        q = jnp.rint(h.astype(jnp.float32) / s + z)
        return jnp.clip(q, -128, 127).astype(dtype)

    # ---- XLA chain (the current mega-fusion structure) --------------
    @jax.jit
    def xla_mlp(x):
        def layer(c, _):
            a1 = jax.lax.dot_general(
                c, w1, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32) - cs1 * zx
            h = gelu_bf16(a1.astype(jnp.float32) * s1 + b1)
            hq = quant(h, sh, zh)
            a2 = jax.lax.dot_general(
                hq, w2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32) - cs2 * zh
            y = a2.astype(jnp.float32) * s2 + b2
            return quant(y, sx, zx), ()
        c, _ = jax.lax.scan(layer, x, None, length=LAYERS)
        return c

    # ---- Pallas fused MLP: both weights VMEM-resident ---------------
    def mlp_kernel(x_ref, w1_ref, cs1_ref, b1_ref, w2_ref, cs2_ref,
                   b2_ref, o_ref):
        x = x_ref[:]
        a1 = jax.lax.dot_general(
            x, w1_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32) - cs1_ref[:] * zx
        h = gelu_bf16(a1.astype(jnp.float32) * s1 + b1_ref[:])
        hq = quant(h, sh, zh)
        a2 = jax.lax.dot_general(
            hq, w2_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32) - cs2_ref[:] * zh
        y = a2.astype(jnp.float32) * s2 + b2_ref[:]
        o_ref[:] = quant(y, sx, zx)

    block_m = int(os.environ.get("NQ_TPU_MLP_BLOCK_M", "512"))
    mp = -(-M // block_m) * block_m

    def pallas_layer(x):
        if mp != M:
            x = jnp.pad(x, ((0, mp - M), (0, 0)))
        y = pl.pallas_call(
            mlp_kernel,
            out_shape=jax.ShapeDtypeStruct((mp, K), jnp.int8),
            grid=(mp // block_m,),
            in_specs=[
                pl.BlockSpec((block_m, K), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, N), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N, K), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block_m, K), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            cost_estimate=pl.CostEstimate(
                flops=4 * mp * K * N,
                bytes_accessed=mp * K * 2 + K * N * 2,
                transcendentals=mp * N),
        )(x, w1, cs1, b1.astype(jnp.float32),
          w2, cs2, b2.astype(jnp.float32))
        return y[:M]

    @jax.jit
    def pallas_mlp(x):
        def layer(c, _):
            return pallas_layer(c), ()
        c, _ = jax.lax.scan(layer, x, None, length=LAYERS)
        return c

    def timed_dev(fn, name):
        """Best-of-3 wall time (the scan is device-bound at these
        shapes, so wall ~= device); jax.profiler is NOT used here --
        it hangs intermittently on the tunneled runtime."""
        out = jax.block_until_ready(fn(x0))   # compile + warm
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(x0))
            best = min(best, time.perf_counter() - t0)
        return out, best / LAYERS * 1e3, best

    ox, xla_ms, _ = timed_dev(xla_mlp, "xla")
    op, pal_ms, _ = timed_dev(pallas_mlp, "pallas")
    match = bool(np.array_equal(np.asarray(ox), np.asarray(op)))
    dot_peak_ms = 4 * M * K * N / 394e12 * 1e3
    rec = {
        "experiment": "mlp_mega_fusion_vmem_resident",
        "batch": BATCH, "block_m": block_m,
        "xla_ms_per_layer": round(xla_ms, 3),
        "pallas_ms_per_layer": round(pal_ms, 3),
        "dot_peak_ms_per_layer": round(dot_peak_ms, 3),
        "xla_pct_of_peak": round(100 * dot_peak_ms / xla_ms, 1),
        "pallas_pct_of_peak": round(100 * dot_peak_ms / pal_ms, 1),
        "outputs_equal": match,
        "saving_ms_12_layers": round(12 * (xla_ms - pal_ms), 2),
    }
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
