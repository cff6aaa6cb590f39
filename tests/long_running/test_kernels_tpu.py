"""Hardware tier: run the Pallas kernels on the REAL TPU and compare
against the XLA/interpret oracles. Gated on NQ_RUN_TPU=1 (the fast
suite runs the same kernels in interpret mode on CPU, which misses
hardware-layout bugs -- the round-1 bit-plane padding corruption was
only visible on the chip).

Runs in a subprocess: tests/conftest.py pins the suite to the CPU
platform before any backend initializes, so the device run needs a
fresh process with the default (TPU) platform.
"""
import os
import subprocess
import sys

import pytest

tpu = pytest.mark.skipif(
    os.environ.get("NQ_RUN_TPU") != "1",
    reason="set NQ_RUN_TPU=1 (with a TPU attached) to run")

_REPO = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))

_SCRIPT = r"""
import sys
sys.path.insert(0, %r)
import numpy as np
import jax, jax.numpy as jnp
assert jax.devices()[0].platform != "cpu", jax.devices()
jax.config.update("jax_compilation_cache_dir", "/tmp/nq_tpu_jaxcache")

import numpy_quant_tpu.quantization as Q
from numpy_quant_tpu.kernels import (pack_bitplanes, pack_splitk,
                                     packed_qmatmul, splitk_qmatmul)
from numpy_quant_tpu.kernels.attention import fused_attention_hs

rng = np.random.default_rng(0)

# ---- split-K packed matmul vs the exact integer chain, on hardware
for bits in (2, 4, 8):
    M, K, N = 160, 200, 140   # deliberately unaligned: exercises padding
    x = (rng.random((M, K)).astype(np.float32) - 0.4) * 3
    w = (rng.random((K, N)).astype(np.float32) - 0.5) * 2
    mn = lambda v: (np.minimum(v.min(), np.float32(0)),
                    np.maximum(v.max(), np.float32(0)))
    sx, zx = Q.quant_parameters(*mn(x), bits, True)
    sw, _ = Q.quant_parameters(*mn(w), bits, False)
    qx = np.asarray(Q.quantize(x, bits, sx, zx))
    qw = np.asarray(Q.quantize(w, bits, sw, None))
    acc, s, zp = Q.q_matmul(qx, sx, zx, qw, sw, None, bit_width=bits)
    desired = np.asarray(Q.dequantize(np.asarray(acc), s,
                                      None if zp is None else np.asarray(zp)))
    payload = qw.astype(np.int8) if bits == 8 else \
        pack_splitk(qw.astype(np.int32), bits)
    colsum = qw.sum(axis=0, keepdims=True).astype(np.int32)
    y = np.asarray(splitk_qmatmul(
        jnp.asarray(x), jnp.asarray(payload), jnp.asarray(colsum), None,
        bits=bits, bit_width=bits, x_scale=float(sx), x_zp=int(zx),
        w_scale=float(sw)))
    np.testing.assert_allclose(y, desired, atol=5e-4)
    print(f"splitk bits={bits} OK")

# ---- bit-plane kernel K/N-padding regression, on hardware
bits = 3
M, K, N = 40, 70, 50
qw = rng.integers(-4, 4, size=(K, N)).astype(np.int32)
x = (rng.random((M, K)).astype(np.float32) - 0.5)
sx, zx = Q.quant_parameters(np.float32(x.min()), np.float32(x.max()),
                            8, True)
qx = np.asarray(Q.quantize(x, 8, sx, zx))
acc, s, zp = Q.q_matmul(qx, sx, zx, qw, np.float32(0.01), None, bit_width=8)
desired = np.asarray(Q.dequantize(np.asarray(acc), s,
                                  None if zp is None else np.asarray(zp)))
planes = pack_bitplanes(qw, bits)
colsum = qw.sum(axis=0, keepdims=True).astype(np.int32)
y = np.asarray(packed_qmatmul(
    jnp.asarray(x), jnp.asarray(planes), jnp.asarray(colsum), None,
    bits=bits, bit_width=8, x_scale=float(sx), x_zp=int(zx),
    w_scale=0.01, block_m=32, block_n=128, block_k=128))
np.testing.assert_allclose(y, desired, atol=5e-4)
print("bitplanes padding OK")

# ---- fused attention (fast serving path) vs the XLA composition
B, N_, H, D = 8, 29, 2, 64  # N deliberately unaligned
hd = H * D
xq = jnp.asarray(rng.integers(-128, 128, (B, N_, hd), np.int64), jnp.int8)
xk = jnp.asarray(rng.integers(-128, 128, (B, N_, hd), np.int64), jnp.int8)
xv = jnp.asarray(rng.integers(-128, 128, (B, N_, hd), np.int64), jnp.int8)
sq, zq, sk, zk, sv, zv = 0.02, 3, 0.03, -2, 0.05, 4
sp, zp_p = 1 / 255., -128
res_s, res_zp = 0.04, -5
y = np.asarray(fused_attention_hs(
    xq, xk, xv, num_heads=H, scaling=0.125, sq=sq, zq=zq, sk=sk, zk=zk,
    sv=sv, zv=zv, sp=sp, zp_p=zp_p, bit_width=8,
    out_requant=(res_s, res_zp), fast=False))

def ref_head(qh, kh, vh):
    acc, s, zp = Q.q_matmul(qh, sq, zq, kh.T, sk, zk, bit_width=8)
    sc = np.asarray(Q.dequantize(np.asarray(acc), s, np.asarray(zp))) * 0.125
    e = np.exp(sc - sc.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    pq = np.asarray(Q.quantize(probs, 8, sp, zp_p))
    acc2, s2, zp2 = Q.q_matmul(pq, sp, zp_p, vh, sv, zv, bit_width=8)
    ctx = np.asarray(Q.dequantize(np.asarray(acc2), s2, np.asarray(zp2)))
    return np.asarray(Q.quantize(ctx, 8, res_s, res_zp))

for b in range(B):
    for h in range(H):
        sl = slice(h * D, (h + 1) * D)
        ref = ref_head(np.asarray(xq[b, :, sl], np.int64),
                       np.asarray(xk[b, :, sl], np.int64),
                       np.asarray(xv[b, :, sl], np.int64))
        np.testing.assert_array_equal(y[b, :, sl].astype(np.int64), ref)
print("fused attention OK")
print("ALL_OK")
""" % (_REPO,)


@tpu
def test_kernels_on_hardware():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # no virtual CPU devices; real chip
    result = subprocess.run([sys.executable, "-c", _SCRIPT], env=env,
                            capture_output=True, text=True, timeout=1800)
    assert result.returncode == 0 and "ALL_OK" in result.stdout, (
        result.stdout[-2000:], result.stderr[-3000:])
