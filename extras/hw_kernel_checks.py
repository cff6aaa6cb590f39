"""Hardware kernel conformance checks on the REAL TPU chip.

The fast suite runs every Pallas kernel in interpret mode on CPU, which
misses hardware layout bugs (the round-1 bit-plane K-padding corruption
was only visible on the chip). This script runs the kernels on the real
device against the exact integer oracles and records a per-round
artifact:

    python extras/hw_kernel_checks.py --json KERNELS_r03.json

Checks: split-K packed matmul (bits 2/4/8, unaligned shapes), bit-plane
kernel padding regression, fused head-split attention (exact + fast
serving paths), and the blockwise long-sequence attention grid.
Used by tests/long_running/test_kernels_tpu.py (NQ_RUN_TPU=1) in a
fresh subprocess (tests/conftest.py pins the suite to CPU).
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(json_path=None):
    import numpy as np
    import jax
    import jax.numpy as jnp

    assert jax.devices()[0].platform != "cpu", jax.devices()
    jax.config.update("jax_compilation_cache_dir", "/tmp/nq_tpu_jaxcache")

    import numpy_quant_tpu.quantization as Q
    from numpy_quant_tpu.kernels import (pack_bitplanes, pack_splitk,
                                         packed_qmatmul, splitk_qmatmul)
    from numpy_quant_tpu.kernels.attention import fused_attention_hs

    rng = np.random.default_rng(0)
    checks = []

    def record(name, fn):
        t0 = time.time()
        fn()
        checks.append({"check": name,
                       "seconds": round(time.time() - t0, 2)})
        print(f"{name} OK", flush=True)

    # ---- split-K packed matmul vs the exact integer chain
    def splitk_check(bits):
        def run():
            M, K, N = 160, 200, 140  # unaligned: exercises padding
            x = (rng.random((M, K)).astype(np.float32) - 0.4) * 3
            w = (rng.random((K, N)).astype(np.float32) - 0.5) * 2

            def mn(v):
                return (np.minimum(v.min(), np.float32(0)),
                        np.maximum(v.max(), np.float32(0)))

            sx, zx = Q.quant_parameters(*mn(x), bits, True)
            sw, _ = Q.quant_parameters(*mn(w), bits, False)
            qx = np.asarray(Q.quantize(x, bits, sx, zx))
            qw = np.asarray(Q.quantize(w, bits, sw, None))
            acc, s, zp = Q.q_matmul(qx, sx, zx, qw, sw, None, bit_width=bits)
            desired = np.asarray(Q.dequantize(
                np.asarray(acc), s, None if zp is None else np.asarray(zp)))
            payload = qw.astype(np.int8) if bits == 8 else \
                pack_splitk(qw.astype(np.int32), bits)
            colsum = qw.sum(axis=0, keepdims=True).astype(np.int32)
            y = np.asarray(splitk_qmatmul(
                jnp.asarray(x), jnp.asarray(payload), jnp.asarray(colsum),
                None, bits=bits, bit_width=bits, x_scale=float(sx),
                x_zp=int(zx), w_scale=float(sw)))
            np.testing.assert_allclose(y, desired, atol=5e-4)
        return run

    for bits in (2, 4, 8):
        record(f"splitk_bits{bits}", splitk_check(bits))

    # ---- bit-plane kernel K/N-padding regression
    def bitplanes_check():
        bits = 3
        M, K, N = 40, 70, 50
        qw = rng.integers(-4, 4, size=(K, N)).astype(np.int32)
        x = (rng.random((M, K)).astype(np.float32) - 0.5)
        sx, zx = Q.quant_parameters(np.float32(x.min()),
                                    np.float32(x.max()), 8, True)
        qx = np.asarray(Q.quantize(x, 8, sx, zx))
        acc, s, zp = Q.q_matmul(qx, sx, zx, qw, np.float32(0.01), None,
                                bit_width=8)
        desired = np.asarray(Q.dequantize(
            np.asarray(acc), s, None if zp is None else np.asarray(zp)))
        planes = pack_bitplanes(qw, bits)
        colsum = qw.sum(axis=0, keepdims=True).astype(np.int32)
        y = np.asarray(packed_qmatmul(
            jnp.asarray(x), jnp.asarray(planes), jnp.asarray(colsum), None,
            bits=bits, bit_width=8, x_scale=float(sx), x_zp=int(zx),
            w_scale=0.01, block_m=32, block_n=128, block_k=128))
        np.testing.assert_allclose(y, desired, atol=5e-4)

    record("bitplanes_padding", bitplanes_check)

    # ---- fused head-split attention (exact path) vs the integer chain
    sq, zq, sk, zk, sv, zv = 0.02, 3, 0.03, -2, 0.05, 4
    sp, zp_p = 1 / 255., -128
    res_s, res_zp = 0.04, -5

    def ref_head(qh, kh, vh, scaling, requant=True, mask=None):
        acc, s, zp = Q.q_matmul(qh, sq, zq, kh.T, sk, zk, bit_width=8)
        sc = np.asarray(Q.dequantize(np.asarray(acc), s,
                                     np.asarray(zp))) * scaling
        if mask is not None:
            sc = sc + mask
        e = np.exp(sc - sc.max(-1, keepdims=True))
        probs = e / e.sum(-1, keepdims=True)
        pq = np.asarray(Q.quantize(probs, 8, sp, zp_p))
        acc2, s2, zp2 = Q.q_matmul(pq, sp, zp_p, vh, sv, zv, bit_width=8)
        ctx = np.asarray(Q.dequantize(np.asarray(acc2), np.asarray(s2),
                                      np.asarray(zp2)))
        if requant:
            return np.asarray(Q.quantize(ctx, 8, res_s, res_zp))
        return ctx

    def attention_check():
        B, N_, H, D = 8, 29, 2, 64  # N deliberately unaligned
        hd = H * D
        xq = jnp.asarray(rng.integers(-128, 128, (B, N_, hd), np.int64),
                         jnp.int8)
        xk = jnp.asarray(rng.integers(-128, 128, (B, N_, hd), np.int64),
                         jnp.int8)
        xv = jnp.asarray(rng.integers(-128, 128, (B, N_, hd), np.int64),
                         jnp.int8)
        y = np.asarray(fused_attention_hs(
            xq, xk, xv, num_heads=H, scaling=0.125, sq=sq, zq=zq, sk=sk,
            zk=zk, sv=sv, zv=zv, sp=sp, zp_p=zp_p, bit_width=8,
            out_requant=(res_s, res_zp), fast=False))
        for b in range(B):
            for h in range(H):
                sl = slice(h * D, (h + 1) * D)
                ref = ref_head(np.asarray(xq[b, :, sl], np.int64),
                               np.asarray(xk[b, :, sl], np.int64),
                               np.asarray(xv[b, :, sl], np.int64), 0.125)
                np.testing.assert_array_equal(
                    y[b, :, sl].astype(np.int64), ref)

    record("fused_attention_hs", attention_check)

    # ---- blockwise long-sequence attention grid on hardware:
    # bit-identical to the monolithic kernel at a size both can run,
    # and correct vs the integer chain at a size ONLY blockwise can
    def blockwise_check():
        B, N_, H, D = 2, 200, 2, 64
        hd = H * D
        xq = jnp.asarray(rng.integers(-128, 128, (B, N_, hd), np.int64),
                         jnp.int8)
        xk = jnp.asarray(rng.integers(-128, 128, (B, N_, hd), np.int64),
                         jnp.int8)
        xv = jnp.asarray(rng.integers(-128, 128, (B, N_, hd), np.int64),
                         jnp.int8)
        kw = dict(num_heads=H, scaling=0.125, sq=sq, zq=zq, sk=sk, zk=zk,
                  sv=sv, zv=zv, sp=sp, zp_p=zp_p, bit_width=8)
        mono = np.asarray(fused_attention_hs(xq, xk, xv, **kw))
        blocked = np.asarray(fused_attention_hs(xq, xk, xv, block_q=64,
                                                **kw))
        np.testing.assert_array_equal(mono, blocked)

    record("blockwise_attention_parity", blockwise_check)

    def blockwise_long_check():
        B, N_, H, D = 1, 4096, 2, 64  # monolithic cannot allocate VMEM
        hd = H * D
        xq = jnp.asarray(rng.integers(-128, 128, (B, N_, hd), np.int64),
                         jnp.int8)
        xk = jnp.asarray(rng.integers(-128, 128, (B, N_, hd), np.int64),
                         jnp.int8)
        xv = jnp.asarray(rng.integers(-128, 128, (B, N_, hd), np.int64),
                         jnp.int8)
        y = np.asarray(fused_attention_hs(
            xq, xk, xv, num_heads=H, scaling=0.125, sq=sq, zq=zq, sk=sk,
            zk=zk, sv=sv, zv=zv, sp=sp, zp_p=zp_p, bit_width=8))
        h = 0
        sl = slice(h * D, (h + 1) * D)
        ref = ref_head(np.asarray(xq[0, :, sl], np.int64),
                       np.asarray(xk[0, :, sl], np.int64),
                       np.asarray(xv[0, :, sl], np.int64), 0.125,
                       requant=False)
        err = np.abs(y[0, :, sl] - ref)
        assert err.mean() < 2e-3 and err.max() < 5e-2, (err.mean(),
                                                       err.max())

    record("blockwise_attention_n4096", blockwise_long_check)

    # ---- causal (decoder) mask: in-kernel additive triangular mask,
    # bit-identical to the unfused math on hardware, monolithic ==
    # blockwise (whose q tiles must index rows by absolute position)
    def causal_check():
        B, N_, H, D = 4, 37, 2, 64
        hd = H * D
        M = float(np.float32(-3.2e8))
        xq = jnp.asarray(rng.integers(-128, 128, (B, N_, hd), np.int64),
                         jnp.int8)
        xk = jnp.asarray(rng.integers(-128, 128, (B, N_, hd), np.int64),
                         jnp.int8)
        xv = jnp.asarray(rng.integers(-128, 128, (B, N_, hd), np.int64),
                         jnp.int8)
        kw = dict(num_heads=H, scaling=0.125, sq=sq, zq=zq, sk=sk, zk=zk,
                  sv=sv, zv=zv, sp=sp, zp_p=zp_p, bit_width=8,
                  causal_mask_val=M)
        y = np.asarray(fused_attention_hs(xq, xk, xv, **kw))
        blocked = np.asarray(fused_attention_hs(xq, xk, xv, block_q=16,
                                                **kw))
        np.testing.assert_array_equal(y, blocked)
        mask = np.triu(np.full((N_, N_), np.float32(M), np.float32), k=1)
        for b in range(B):
            for h in range(H):
                sl = slice(h * D, (h + 1) * D)
                ref = ref_head(np.asarray(xq[b, :, sl], np.int64),
                               np.asarray(xk[b, :, sl], np.int64),
                               np.asarray(xv[b, :, sl], np.int64), 0.125,
                               requant=False, mask=mask)
                np.testing.assert_array_equal(y[b, :, sl], ref)

    record("causal_attention", causal_check)

    # ---- per-head score bias (T5 relative position bias / ALiBi): the
    # bias operand rides into VMEM; bit-identical to the unfused math
    # on hardware, monolithic == blockwise (bias rows tile with q)
    def score_bias_check():
        B, N_, H, D = 4, 37, 2, 64
        hd = H * D
        xq = jnp.asarray(rng.integers(-128, 128, (B, N_, hd), np.int64),
                         jnp.int8)
        xk = jnp.asarray(rng.integers(-128, 128, (B, N_, hd), np.int64),
                         jnp.int8)
        xv = jnp.asarray(rng.integers(-128, 128, (B, N_, hd), np.int64),
                         jnp.int8)
        bias = (rng.normal(size=(H, N_, N_)) * 2.0).astype(np.float32)
        kw = dict(num_heads=H, scaling=0.125, sq=sq, zq=zq, sk=sk, zk=zk,
                  sv=sv, zv=zv, sp=sp, zp_p=zp_p, bit_width=8)
        y = np.asarray(fused_attention_hs(xq, xk, xv, jnp.asarray(bias),
                                          **kw))
        blocked = np.asarray(fused_attention_hs(
            xq, xk, xv, jnp.asarray(bias), block_q=16, **kw))
        np.testing.assert_array_equal(y, blocked)

        # ON-DEVICE unfused oracle: the bit-exactness contract is
        # fused == unfused ON THE SAME DEVICE. A dense random bias
        # lands some probability exactly on a rint boundary where the
        # chip's exp differs from numpy's libm by 1 ulp, so a host-
        # numpy softmax is NOT the right reference here (observed:
        # one flipped probs row per ~10k at these sizes).
        @jax.jit
        def unfused(qh, kh, vh, mask):
            acc, s, zp = Q.q_matmul(qh, np.float32(sq), np.int64(zq),
                                    kh.T, np.float32(sk), np.int64(zk),
                                    bit_width=8)
            sc = Q.dequantize(acc, s, zp) * np.float32(0.125) + mask
            e = jnp.exp(sc - sc.max(-1, keepdims=True))
            probs = (e / e.sum(-1, keepdims=True)).astype(jnp.float32)
            pq = Q.quantize(probs, 8, np.float32(sp), np.int64(zp_p))
            acc2, s2, zp2 = Q.q_matmul(pq, np.float32(sp), np.int64(zp_p),
                                       vh, np.float32(sv), np.int64(zv),
                                       bit_width=8)
            return Q.dequantize(acc2, s2, zp2)

        for b in range(B):
            for h in range(H):
                sl = slice(h * D, (h + 1) * D)
                ref = np.asarray(unfused(
                    jnp.asarray(xq[b, :, sl], jnp.int32),
                    jnp.asarray(xk[b, :, sl], jnp.int32),
                    jnp.asarray(xv[b, :, sl], jnp.int32),
                    jnp.asarray(bias[h]))).astype(np.float32)
                np.testing.assert_array_equal(y[b, :, sl], ref)

    record("score_bias_attention", score_bias_check)

    # ---- sliding-window (banded causal) mask on hardware: the window
    # band must index rows/cols by absolute position on both grids
    def sliding_window_check():
        B, N_, H, D = 4, 37, 2, 64
        W = 9
        hd = H * D
        M = float(np.float32(-3.2e8))
        xq = jnp.asarray(rng.integers(-128, 128, (B, N_, hd), np.int64),
                         jnp.int8)
        xk = jnp.asarray(rng.integers(-128, 128, (B, N_, hd), np.int64),
                         jnp.int8)
        xv = jnp.asarray(rng.integers(-128, 128, (B, N_, hd), np.int64),
                         jnp.int8)
        kw = dict(num_heads=H, scaling=0.125, sq=sq, zq=zq, sk=sk, zk=zk,
                  sv=sv, zv=zv, sp=sp, zp_p=zp_p, bit_width=8,
                  causal_mask_val=M, causal_window=W)
        y = np.asarray(fused_attention_hs(xq, xk, xv, **kw))
        blocked = np.asarray(fused_attention_hs(xq, xk, xv, block_q=16,
                                                **kw))
        np.testing.assert_array_equal(y, blocked)
        i, j = np.indices((N_, N_))
        band = np.where((j <= i) & (j > i - W), np.float32(0),
                        np.float32(M))
        for b in range(B):
            for h in range(H):
                sl = slice(h * D, (h + 1) * D)
                ref = ref_head(np.asarray(xq[b, :, sl], np.int64),
                               np.asarray(xk[b, :, sl], np.int64),
                               np.asarray(xv[b, :, sl], np.int64), 0.125,
                               requant=False, mask=band)
                np.testing.assert_array_equal(y[b, :, sl], ref)

    record("sliding_window_attention", sliding_window_check)

    # ---- causal mask on the PLAIN (non-head-split) kernel, at a
    # blockwise N: the q-row tiles must mask by ABSOLUTE row position
    # (models/llama.py RoPE/GQA graphs fuse through this path)
    def causal_plain_check():
        from numpy_quant_tpu.kernels.attention import fused_attention

        BH, N_, D = 2, 1536, 64
        M = float(np.float32(-3.2e8))
        q = jnp.asarray(rng.integers(-128, 128, (BH, N_, D), np.int64),
                        jnp.int8)
        kt = jnp.asarray(rng.integers(-128, 128, (BH, D, N_), np.int64),
                         jnp.int8)
        v = jnp.asarray(rng.integers(-128, 128, (BH, N_, D), np.int64),
                        jnp.int8)
        y = np.asarray(fused_attention(
            q, kt, v, scaling=0.125, sq=sq, zq=zq, sk=sk, zk=zk, sv=sv,
            zv=zv, sp=sp, zp_p=zp_p, bit_width=8, causal_mask_val=M))
        mask = np.triu(np.full((N_, N_), np.float32(M), np.float32), k=1)
        for b in range(BH):
            ref = ref_head(np.asarray(q[b], np.int64),
                           np.asarray(kt[b], np.int64).T,
                           np.asarray(v[b], np.int64), 0.125,
                           requant=False, mask=mask)
            np.testing.assert_allclose(y[b], ref, atol=2e-2)

    record("causal_plain_attention", causal_plain_check)

    # ---- weight-only split-K kernel (grouped-scale fused dequant) vs
    # the dequantize-then-dot oracle -- round-5 kernel, f32 and bf16
    def splitk_wo_check(bits, g, dtype):
        from numpy_quant_tpu.kernels.qmatmul import splitk_wo_matmul

        def run():
            M, K, N = 64, 512, 300   # N unaligned: exercises padding
            lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
            w = rng.integers(lo, hi + 1, size=(K, N)).astype(np.int8)
            s = np.abs(rng.normal(size=(g, N))).astype(np.float32) * 0.1
            x = rng.normal(size=(M, K)).astype(np.float32)
            want = x @ (w.astype(np.float32)
                        * np.repeat(s, K // g, axis=0))
            packed = jnp.asarray(w) if bits == 8 \
                else jnp.asarray(pack_splitk(w, bits))
            got = np.asarray(splitk_wo_matmul(
                jnp.asarray(x, dtype), packed, jnp.asarray(s),
                bits=bits), np.float32)
            tol = 2e-2 if dtype == jnp.float32 else 2.0
            np.testing.assert_allclose(got, want, rtol=tol / 10,
                                       atol=tol)
        return run

    record("splitk_wo_w4_grouped_f32", splitk_wo_check(4, 8, jnp.float32))
    record("splitk_wo_w4_grouped_bf16",
           splitk_wo_check(4, 8, jnp.bfloat16))
    record("splitk_wo_w8_perchan_f32", splitk_wo_check(8, 1, jnp.float32))

    # ---- split-K integer kernel at the round-4 scoped-vmem auto-cap
    # shape (K=8192 drove block_n halving; commit 863b24d)
    def splitk_autocap_check():
        M, K, N = 64, 8192, 1024
        x = (rng.random((M, K)).astype(np.float32) - 0.4) * 3
        w = (rng.random((K, N)).astype(np.float32) - 0.5) * 2

        def mn(v):
            return (np.minimum(v.min(), np.float32(0)),
                    np.maximum(v.max(), np.float32(0)))

        sx, zx = Q.quant_parameters(*mn(x), 8, True)
        sw, _ = Q.quant_parameters(*mn(w), 8, False)
        qx = np.asarray(Q.quantize(x, 8, sx, zx), np.int64)
        qw = np.asarray(Q.quantize(w, 8, sw, None), np.int64)
        acc = qx @ qw
        zp_corr = qw.sum(axis=0, keepdims=True) * int(zx)
        want = (acc - zp_corr).astype(np.float32) \
            * (np.float32(sx) * np.float32(sw))
        got = np.asarray(splitk_qmatmul(
            jnp.asarray(x), jnp.asarray(qw, jnp.int8),
            jnp.asarray(qw.sum(axis=0, keepdims=True), jnp.int32),
            bits=8, bit_width=8, x_scale=float(sx), x_zp=int(zx),
            w_scale=float(sw)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-2)

    record("splitk_autocap_k8192", splitk_autocap_check)

    print("ALL_OK", flush=True)
    if json_path:
        artifact = {
            "ok": True,
            "device": str(jax.devices()[0]),
            "checks": checks,
        }
        with open(json_path, "w") as f:
            json.dump(artifact, f, indent=1)
        print(f"wrote {json_path}")


if __name__ == "__main__":
    path = None
    if "--json" in sys.argv:
        path = sys.argv[sys.argv.index("--json") + 1]
    main(path)
