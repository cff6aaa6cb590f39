"""Pallas kernel layer (interpret mode on CPU; the same kernels compile
for TPU): sub-byte packing, fused packed matmul, elementwise q/dq."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import numpy_quant_tpu.quantization as Q
from numpy_quant_tpu.kernels import (
    dequantize_pallas,
    pack_bitplanes,
    pack_splitk,
    packed_qmatmul,
    quantize_pallas,
    splitk_qmatmul,
    unpack_bitplanes,
    unpack_splitk,
)

RNG = np.random.default_rng(0)


@pytest.mark.parametrize("bits", list(range(1, 9)))
def test_pack_roundtrip(bits):
    lo, hi = -(2 ** (bits - 1)), 2 ** (bits - 1) - 1
    q = RNG.integers(lo, hi + 1, size=(37, 19)).astype(np.int32)
    planes = pack_bitplanes(q, bits)
    assert planes.dtype == np.uint8
    assert planes.shape == (bits, 5, 19)  # ceil(37/8) = 5 -> b/8 bytes/value
    out = np.asarray(unpack_bitplanes(jnp.asarray(planes), bits, 37))
    np.testing.assert_array_equal(out, q.astype(np.int8))


@pytest.mark.parametrize("bits", [1, 2, 4])
def test_pack_splitk_roundtrip(bits):
    from numpy_quant_tpu.kernels.pack import unpack_splitk_np
    lo, hi = -(2 ** (bits - 1)), 2 ** (bits - 1) - 1
    q = RNG.integers(lo, hi + 1, size=(37, 19)).astype(np.int32)
    packed = pack_splitk(q, bits)
    assert packed.dtype == np.uint8
    r = 8 // bits
    assert packed.shape == (-(-37 // r), 19)  # bits/8 bytes per value
    np.testing.assert_array_equal(unpack_splitk_np(packed, bits, 37),
                                  q.astype(np.int8))
    out = np.asarray(unpack_splitk(jnp.asarray(packed), bits, 37))
    np.testing.assert_array_equal(out, q.astype(np.int8))


@pytest.mark.parametrize("bits", [1, 2, 4, 8])
def test_splitk_qmatmul_matches_reference_chain(bits):
    """splitk_qmatmul == quantize -> q_matmul -> dequantize (+bias) from
    the core, including asymmetric-activation zero-point correction and
    K/N padding to MXU tiles."""
    M, K, N = 37, 96, 43
    x = (RNG.random((M, K)).astype(np.float32) - 0.4) * 3
    w = (RNG.random((K, N)).astype(np.float32) - 0.5) * 2

    def mm(v):
        return (np.minimum(v.min(), np.float32(0)),
                np.maximum(v.max(), np.float32(0)))

    sx, zx = Q.quant_parameters(*mm(x), bits, True)
    sw, zw = Q.quant_parameters(*mm(w), bits, False)
    qx = np.asarray(Q.quantize(x, bits, sx, zx))
    qw = np.asarray(Q.quantize(w, bits, sw, zw))
    acc, s, zp = Q.q_matmul(qx, sx, zx, qw, sw, zw, bit_width=bits)
    desired = np.asarray(Q.dequantize(
        np.asarray(acc), s, None if zp is None else np.asarray(zp)))
    bias = RNG.random((1, N)).astype(np.float32)

    payload = qw.astype(np.int8) if bits == 8 else \
        pack_splitk(qw.astype(np.int32), bits)
    colsum = qw.sum(axis=0, keepdims=True).astype(np.int32)
    y = np.asarray(splitk_qmatmul(
        jnp.asarray(x), jnp.asarray(payload), jnp.asarray(colsum),
        jnp.asarray(bias), bits=bits, bit_width=bits,
        x_scale=float(sx), x_zp=int(zx), w_scale=float(sw),
        block_m=16, block_n=128, interpret=True))
    np.testing.assert_allclose(y, desired + bias, atol=5e-5)


def test_splitk_qmatmul_fused_requantize_and_per_channel():
    """int8-output epilogue + per-channel scale rows on the split-K
    kernel, bit-exact vs the unpacked core chain."""
    bits = 4
    M, K, N = 24, 70, 40
    x = (RNG.random((M, K)).astype(np.float32) - 0.5) * 2
    qw = RNG.integers(-8, 8, size=(K, N)).astype(np.int32)
    sw_vec = (0.01 + RNG.random(N).astype(np.float32) * 0.05)

    def mm(v):
        return (np.minimum(v.min(), np.float32(0)),
                np.maximum(v.max(), np.float32(0)))

    sx, zx = Q.quant_parameters(*mm(x), bits, True)
    qx = np.asarray(Q.quantize(x, bits, sx, zx))
    acc, s, zp = Q.q_matmul(qx, sx, zx, qw, sw_vec.reshape(1, N), None,
                            bit_width=bits)
    res_s, res_zp = np.float32(0.07), 3
    # requantize = rint-then-clip float path (numpy_quantization.py:64-72)
    desired = np.asarray(Q.requantize(
        np.asarray(acc), s, None if zp is None else np.asarray(zp),
        res_s, res_zp, 8))

    payload = pack_splitk(qw, bits)
    colsum = qw.sum(axis=0, keepdims=True).astype(np.int32)
    got = np.asarray(splitk_qmatmul(
        jnp.asarray(x), jnp.asarray(payload), jnp.asarray(colsum), None,
        w_scale_vec=jnp.asarray(sw_vec), bits=bits, bit_width=bits,
        x_scale=float(sx), x_zp=int(zx),
        out_requant=(float(res_s), int(res_zp), 8),
        block_m=8, block_n=128, interpret=True))
    np.testing.assert_array_equal(got.astype(np.int64),
                                  desired.astype(np.int64))


@pytest.mark.parametrize("bits", [2, 3, 4, 7, 8])
def test_packed_qmatmul_matches_reference_chain(bits):
    M, K, N = 37, 96, 43
    x = (RNG.random((M, K)).astype(np.float32) - 0.4) * 3
    w = (RNG.random((K, N)).astype(np.float32) - 0.5) * 2

    def mm(v):
        return (np.minimum(v.min(), np.float32(0)),
                np.maximum(v.max(), np.float32(0)))

    sx, zx = Q.quant_parameters(*mm(x), bits, True)
    sw, zw = Q.quant_parameters(*mm(w), bits, False)
    qx = np.asarray(Q.quantize(x, bits, sx, zx))
    qw = np.asarray(Q.quantize(w, bits, sw, zw))
    acc, s, zp = Q.q_matmul(qx, sx, zx, qw, sw, zw, bit_width=bits)
    desired = np.asarray(Q.dequantize(
        np.asarray(acc), s, None if zp is None else np.asarray(zp)))
    bias = RNG.random((1, N)).astype(np.float32)

    planes = pack_bitplanes(qw.astype(np.int32), bits)
    colsum = qw.sum(axis=0, keepdims=True).astype(np.int32)
    y = np.asarray(packed_qmatmul(
        jnp.asarray(x), jnp.asarray(planes), jnp.asarray(colsum),
        jnp.asarray(bias), bits=bits, bit_width=bits,
        x_scale=float(sx), x_zp=int(zx), w_scale=float(sw),
        block_m=16, block_n=128, block_k=32, interpret=True))
    np.testing.assert_allclose(y, desired + bias, atol=5e-5)


def test_packed_qmatmul_symmetric_activation():
    bits = 8
    M, K, N = 16, 64, 32
    x = RNG.normal(size=(M, K)).astype(np.float32)
    w = RNG.normal(size=(K, N)).astype(np.float32)

    def mm(v):
        return (np.minimum(v.min(), np.float32(0)),
                np.maximum(v.max(), np.float32(0)))

    sx, _ = Q.quant_parameters(*mm(x), bits, False)
    sw, _ = Q.quant_parameters(*mm(w), bits, False)
    qx = np.asarray(Q.quantize(x, bits, sx, None))
    qw = np.asarray(Q.quantize(w, bits, sw, None))
    desired = (qx @ qw).astype(np.float32) * (sx * sw)

    planes = pack_bitplanes(qw.astype(np.int32), bits)
    colsum = qw.sum(axis=0, keepdims=True).astype(np.int32)
    y = np.asarray(packed_qmatmul(
        jnp.asarray(x), jnp.asarray(planes), jnp.asarray(colsum), None,
        bits=bits, bit_width=bits, x_scale=float(sx), x_zp=None,
        w_scale=float(sw), block_m=8, block_n=128, block_k=64,
        interpret=True))
    np.testing.assert_allclose(y, desired, atol=5e-5)


@pytest.mark.parametrize("bits,asym", [(8, True), (8, False), (4, True)])
def test_elementwise_kernels_match_core(bits, asym):
    x = (RNG.random((13, 40)).astype(np.float32) - 0.3) * 5
    mn = np.minimum(x.min(), np.float32(0))
    mx = np.maximum(x.max(), np.float32(0))
    scale, zp = Q.quant_parameters(mn, mx, bits, asym)

    q_core = np.asarray(Q.quantize(x, bits, scale, zp))
    q_pal = np.asarray(quantize_pallas(
        jnp.asarray(x), bit_width=bits, scale=float(scale),
        zero_point=None if zp is None else int(zp), interpret=True))
    np.testing.assert_array_equal(q_core.astype(np.int64),
                                  q_pal.astype(np.int64))

    d_core = np.asarray(Q.dequantize(q_core, scale, zp))
    d_pal = np.asarray(dequantize_pallas(
        jnp.asarray(q_pal), scale=float(scale),
        zero_point=None if zp is None else int(zp), interpret=True))
    np.testing.assert_allclose(d_pal, d_core, atol=1e-6)


def test_pack_weights_qmodel():
    """QModel.pack_weights: sub-byte HBM storage + fused Pallas matmul
    path matches the generic executor within f32 rounding."""
    import numpy_quant_tpu as nq
    from numpy_quant_tpu.models import vit as V
    from numpy_quant_tpu.tensor import PackedQTensor

    m = V.vit_self_attention(1, 10, 16, 4)
    x = RNG.normal(size=(1, 10, 16)).astype(np.float32)
    model = nq.Model.from_onnx(m)
    qmodel = model.quantize([x], bit_width=8)
    expected = qmodel([x])[0]

    n_packed = qmodel.pack_weights()
    assert n_packed >= 3  # q/k/v projection weights
    packed_consts = [v for v in qmodel.values
                     if hasattr(v, "data") and isinstance(v.data, PackedQTensor)]
    assert len(packed_consts) == n_packed
    actual = qmodel([x])[0]
    np.testing.assert_allclose(actual, expected, atol=1e-4)


def test_pack_weights_bit4():
    import numpy_quant_tpu as nq
    from numpy_quant_tpu.models import gnn

    n, e, f, h, c = 24, 60, 16, 32, 4
    m = gnn.gcn_dense(n, e, f, h, c, seed=0)
    x = RNG.standard_normal((n, f)).astype(np.float32)
    model = nq.Model.from_onnx(m)
    qmodel = model.quantize([x], bit_width=4)
    expected = qmodel([x])[0]
    qmodel.pack_weights()
    actual = qmodel([x])[0]
    np.testing.assert_allclose(actual, expected, atol=1e-3)


def test_packed_qmatmul_fused_requantize():
    """Fused requantize epilogue: int8 output matches the reference
    chain quantize->q_matmul->(+bias)->requantize."""
    bits = 8
    M, K, N = 24, 64, 40
    x = (RNG.random((M, K)).astype(np.float32) - 0.4) * 3
    w = (RNG.random((K, N)).astype(np.float32) - 0.5) * 2

    def mm(v):
        return (np.minimum(v.min(), np.float32(0)),
                np.maximum(v.max(), np.float32(0)))

    sx, zx = Q.quant_parameters(*mm(x), bits, True)
    sw, _ = Q.quant_parameters(*mm(w), bits, False)
    qx = np.asarray(Q.quantize(x, bits, sx, zx))
    qw = np.asarray(Q.quantize(w, bits, sw, None))
    acc, s, zp = Q.q_matmul(qx, sx, zx, qw, sw, None, bit_width=bits)
    yf = np.matmul(x, w)
    so, zo = Q.quant_parameters(*mm(yf), bits, True)
    desired = np.asarray(Q.requantize(np.asarray(acc), s,
                                      np.asarray(zp), so, zo, bits))

    planes = pack_bitplanes(qw.astype(np.int32), bits)
    colsum = qw.sum(axis=0, keepdims=True).astype(np.int32)
    q_out = np.asarray(packed_qmatmul(
        jnp.asarray(x), jnp.asarray(planes), jnp.asarray(colsum), None,
        bits=bits, bit_width=bits, x_scale=float(sx), x_zp=int(zx),
        w_scale=float(sw), block_m=8, block_n=128, block_k=64,
        interpret=True, out_requant=(float(so), int(zo), bits)))
    assert q_out.dtype == np.int8
    # f32 vs f64 epilogue rounding can flip a value at an exact .5 tie
    assert np.mean(q_out.astype(np.int64) != desired.astype(np.int64)) < 0.01
    assert np.abs(q_out.astype(np.int64) - desired.astype(np.int64)).max() <= 1


def test_packed_qmatmul_k_padding_regression():
    """K not a multiple of block_k: padded bit-planes must decode to
    weight value 0 (a zero pad decodes to -2^(b-1) and corrupted
    accumulations on hardware)."""
    bits = 8
    M, K, N = 16, 200, 130  # K pads 200->256, N pads 130->256
    x = (RNG.random((M, K)).astype(np.float32) - 0.4) * 3
    w = (RNG.random((K, N)).astype(np.float32) - 0.5) * 2

    def mm(v):
        return (np.minimum(v.min(), np.float32(0)),
                np.maximum(v.max(), np.float32(0)))

    sx, zx = Q.quant_parameters(*mm(x), bits, True)
    sw, _ = Q.quant_parameters(*mm(w), bits, False)
    qx = np.asarray(Q.quantize(x, bits, sx, zx))
    qw = np.asarray(Q.quantize(w, bits, sw, None))
    acc, s, zp = Q.q_matmul(qx, sx, zx, qw, sw, None, bit_width=bits)
    desired = np.asarray(Q.dequantize(np.asarray(acc), s, np.asarray(zp)))

    planes = pack_bitplanes(qw.astype(np.int32), bits)
    colsum = qw.sum(axis=0, keepdims=True).astype(np.int32)
    y = np.asarray(packed_qmatmul(
        jnp.asarray(x), jnp.asarray(planes), jnp.asarray(colsum), None,
        bits=bits, bit_width=bits, x_scale=float(sx), x_zp=int(zx),
        w_scale=float(sw), block_m=16, block_n=256, block_k=256,
        interpret=True))
    np.testing.assert_allclose(y, desired, atol=5e-5)


def test_fuse_attention_bit_identical():
    """QModel.fuse_attention: the VMEM-resident attention kernel is
    bit-identical to the unfused graph path."""
    import numpy_quant_tpu as nq
    from numpy_quant_tpu.models import vit as V

    m = V.vit_self_attention(2, 10, 16, 4)
    x = RNG.normal(size=(2, 10, 16)).astype(np.float32)
    model = nq.Model.from_onnx(m)
    qmodel = model.quantize([x], bit_width=8)
    ref = qmodel([x])[0]
    assert qmodel.fuse_attention() == 1
    assert "FusedAttention" in qmodel.quantized_ops
    out = qmodel([x])[0]
    np.testing.assert_array_equal(out, ref)


def test_fuse_attention_full_vit():
    import numpy_quant_tpu as nq
    from numpy_quant_tpu.models import vit as V

    m = V.vit(2, 32, 8, 24, 16, 4)
    x = RNG.normal(size=(2, 3, 32, 32)).astype(np.float32)
    model = nq.Model.from_onnx(m)
    f = model([x])[0]
    qmodel = model.quantize([x], bit_width=8)
    ref = qmodel([x])[0]
    assert qmodel.fuse_attention() == 2  # one per encoder layer
    out = qmodel([x])[0]
    np.testing.assert_array_equal(out, ref)
    assert np.mean(np.abs(out - f)) <= 0.1


def test_optimize_bit_identical_small_vit():
    """QModel.optimize() (attention fusion incl. head-split swallowing +
    early-int8 dataflow) is bit-identical to the plain executor."""
    import numpy_quant_tpu as nq
    from numpy_quant_tpu.models.vit import vit_image_classifier
    from transformers import ViTConfig

    cfg = ViTConfig(image_size=32, patch_size=8, hidden_size=24,
                    num_attention_heads=3, intermediate_size=48,
                    num_hidden_layers=2, num_labels=5)
    m = vit_image_classifier(config=cfg, batch_size=4, seed=0)
    x = RNG.normal(size=(4, 3, 32, 32)).astype(np.float32)
    model = nq.Model.from_onnx(m)
    qmodel = model.quantize([x], bit_width=8)
    ref = qmodel([x])[0]
    stats = qmodel.optimize()
    # the classifier export carries the standard head split/merge, so
    # fusion must hit the head-splitting kernel
    assert stats["fuse_attention"] == 2
    assert any(n.op == "FusedAttentionHS" for n in qmodel.nodes)
    assert stats["int8_dataflow"] > 0
    out = qmodel([x])[0]
    np.testing.assert_array_equal(out, ref)


def test_int8_dataflow_bit_identical_mlp():
    import numpy_quant_tpu as nq

    m = nq.onnx.load("numpy_quant_tpu/models/mlp.onnx")
    x = RNG.normal(size=(64, 2)).astype(np.float32)
    model = nq.Model.from_onnx(m)
    qmodel = model.quantize([x], bit_width=8)
    ref = qmodel([x])[0]
    assert qmodel.int8_dataflow() >= 1
    np.testing.assert_array_equal(qmodel([x])[0], ref)


def test_merge_parallel_matmuls_bit_identical():
    """QModel.merge_parallel_matmuls (horizontal QKV fusion: one wide
    dot + in-graph split) is bit-identical to the separate dots, alone
    and composed with the other optimize() passes."""
    import numpy_quant_tpu as nq
    from numpy_quant_tpu.models.vit import vit_image_classifier
    from transformers import ViTConfig

    cfg = ViTConfig(image_size=32, patch_size=8, hidden_size=24,
                    num_attention_heads=3, intermediate_size=48,
                    num_hidden_layers=2, num_labels=5)
    m = vit_image_classifier(config=cfg, batch_size=4, seed=0)
    x = RNG.normal(size=(4, 3, 32, 32)).astype(np.float32)
    model = nq.Model.from_onnx(m)
    qmodel = model.quantize([x], bit_width=8)
    ref = qmodel([x])[0]
    # one q/k/v group per encoder layer merges
    assert qmodel.merge_parallel_matmuls() == 2
    assert any(n.op == "MatMulSplit" for n in qmodel.nodes)
    np.testing.assert_array_equal(qmodel([x])[0], ref)
    # composes with attention fusion + early-int8 layout (opt-in:
    # optimize() only runs the pass when _opt_merge_matmuls is set)
    qmodel2 = model.quantize([x], bit_width=8)
    qmodel2._opt_merge_matmuls = True
    stats = qmodel2.optimize()
    assert stats["merge_parallel_matmuls"] == 2
    np.testing.assert_array_equal(qmodel2([x])[0], ref)


def test_fused_attention_hs_kernel_direct():
    """fused_attention_hs == per-head reference math, incl. the MXU
    ones-hijack correction paths (all zero points nonzero) and the
    fused int8 out_requant epilogue."""
    import jax
    from numpy_quant_tpu.kernels.attention import fused_attention_hs
    from numpy_quant_tpu.quantization import quantize as q_, dequantize as dq_

    B, N, H, D = 2, 10, 4, 8
    sq, zq, sk, zk, sv, zv = 0.02, 3, 0.03, -2, 0.05, 4
    sp, zp_p = 1 / 255., -128
    so, zo = 0.04, 1
    rng = np.random.default_rng(0)
    xq = rng.integers(-100, 100, size=(B, N, H * D)).astype(np.int8)
    xk = rng.integers(-100, 100, size=(B, N, H * D)).astype(np.int8)
    xv = rng.integers(-100, 100, size=(B, N, H * D)).astype(np.int8)

    out = np.asarray(fused_attention_hs(
        xq, xk, xv, num_heads=H, scaling=0.5, sq=sq, zq=zq, sk=sk, zk=zk,
        sv=sv, zv=zv, sp=sp, zp_p=zp_p, bit_width=8,
        out_requant=(so, zo),
        interpret=jax.default_backend() == "cpu"))

    # reference: unfused q_matmul/softmax/quantize per head
    from numpy_quant_tpu.quantization import q_matmul
    import jax.numpy as jnp
    expect = np.zeros((B, N, H * D), np.int64)
    for b in range(B):
        for h in range(H):
            sl = slice(h * D, (h + 1) * D)
            qh = xq[b][:, sl].astype(np.int64)
            kh = xk[b][:, sl].astype(np.int64)
            vh = xv[b][:, sl].astype(np.int64)
            acc, scale, zp = q_matmul(jnp.asarray(qh), np.float32(sq),
                                      np.int64(zq), jnp.asarray(kh.T),
                                      np.float32(sk), np.int64(zk),
                                      bit_width=8)
            s = np.asarray(dq_(acc, scale, zp)) * np.float32(0.5)
            e = np.exp(s - s.max(-1, keepdims=True))
            probs = (e / e.sum(-1, keepdims=True)).astype(np.float32)
            pq = np.asarray(q_(probs, 8, np.float32(sp), np.int64(zp_p)))
            acc2, scale2, zp2 = q_matmul(jnp.asarray(pq), np.float32(sp),
                                         np.int64(zp_p), jnp.asarray(vh),
                                         np.float32(sv), np.int64(zv),
                                         bit_width=8)
            y = np.asarray(dq_(acc2, scale2, zp2))
            expect[b][:, sl] = np.asarray(q_(y, 8, np.float32(so),
                                             np.int64(zo)))
    np.testing.assert_array_equal(out.astype(np.int64), expect)


def test_packed_per_channel_bit_exact():
    """Per-channel weight scales compose with packed sub-byte storage
    (round-1 gap: mutually exclusive): the kernel epilogue takes the
    combined sx*sw_j scale row, bit-exact vs the unpacked path."""
    import numpy_quant_tpu as nq
    from numpy_quant_tpu.models.vit import vit_image_classifier
    from transformers import ViTConfig

    cfg = ViTConfig(image_size=32, patch_size=8, hidden_size=24,
                    num_attention_heads=3, intermediate_size=48,
                    num_hidden_layers=2, num_labels=5)
    m = vit_image_classifier(config=cfg, batch_size=4, seed=0)
    x = RNG.normal(size=(4, 3, 32, 32)).astype(np.float32)
    model = nq.Model.from_onnx(m)
    q4 = model.quantize([x], bit_width=4, per_channel_weights=True)
    ref = q4([x])[0]
    assert q4.pack_weights() > 0
    np.testing.assert_array_equal(q4([x])[0], ref)


def test_w4a8_mixed_width():
    """weight_bit_width < bit_width (W4A8): 4-bit packed weights with
    8-bit activations -- parity-plus (the reference asserts equal
    operand widths, tensor.py:206). Accuracy stays near int8 because
    activations keep 8 bits."""
    import numpy_quant_tpu as nq
    from numpy_quant_tpu.models.vit import vit_image_classifier
    from transformers import ViTConfig

    cfg = ViTConfig(image_size=32, patch_size=8, hidden_size=24,
                    num_attention_heads=3, intermediate_size=48,
                    num_hidden_layers=2, num_labels=5)
    m = vit_image_classifier(config=cfg, batch_size=4, seed=0)
    x = RNG.normal(size=(4, 3, 32, 32)).astype(np.float32)
    model = nq.Model.from_onnx(m)
    f = model([x])[0]
    q = model.quantize([x], bit_width=8, weight_bit_width=4,
                       per_channel_weights=True)
    # only matmul weights carry 4 bits; other constants stay 8-bit
    from numpy_quant_tpu.graph import Constant
    from numpy_quant_tpu.tensor import QTensor
    widths = {v.data.bit_width for v in q.values
              if isinstance(v, Constant) and isinstance(v.data, QTensor)}
    assert 4 in widths and (8 in widths or 32 in widths)
    out = q([x])[0]
    denom = f.max() - f.min()
    err_w4a8 = np.mean(np.abs(out - f)) / denom
    assert err_w4a8 < 0.08, err_w4a8
    # packing applies to the 4-bit weights (exactly 4 bits/value in HBM)
    assert q.pack_weights() > 0
    np.testing.assert_array_equal(q([x])[0], out)


def test_fusion_diagnostics_reports_reasons():
    """Every Softmax that does not fuse is recorded with a reason
    (a silent fall-back on a foreign exporter's pattern would be an
    invisible perf cliff)."""
    import numpy_quant_tpu as nq
    from numpy_quant_tpu import onnx as O

    # a Softmax whose input comes straight from a MatMul (no Mul/Div
    # scale node) -- common in exporters that fold the 1/sqrt(d) into
    # the weights; our matcher requires the scale node
    b, n, d = 2, 6, 8
    x = RNG.normal(size=(b, n, d)).astype(np.float32)
    wq = RNG.normal(size=(d, d)).astype(np.float32)
    nodes = [
        O.make_node("MatMul", ["x", "wq"], ["q"], name="mq"),
        O.make_node("MatMul", ["q", "kt"], ["scores"], name="ms"),
        O.make_node("Softmax", ["scores"], ["probs"], name="sm", axis=-1),
        O.make_node("MatMul", ["probs", "v"], ["y"], name="mv"),
    ]
    g = O.make_graph(
        nodes, "g",
        [O.make_tensor_value_info("x", O.TensorProto.FLOAT, [b, n, d])],
        [O.make_tensor_value_info("y", O.TensorProto.FLOAT, None)],
        initializer=[
            O.from_array(wq, "wq"),
            O.from_array(RNG.normal(size=(d, n)).astype(np.float32), "kt"),
            O.from_array(RNG.normal(size=(n, d)).astype(np.float32), "v")])
    model = nq.Model.from_onnx(O.make_model(g))
    qmodel = model.quantize([x], bit_width=8)
    stats = qmodel.optimize()
    assert stats["fuse_attention"] == 0
    assert len(stats["fusion_failures"]) == 1
    name, reason = stats["fusion_failures"][0]
    assert name == "sm"
    assert "head-split" in reason  # pre-scaled form needs the HS match

    # a graph that DOES fuse reports no failures
    from numpy_quant_tpu.models import vit as V
    m2 = V.vit_self_attention(2, 10, 16, 4)
    x2 = RNG.normal(size=(2, 10, 16)).astype(np.float32)
    q2 = nq.Model.from_onnx(m2).quantize([x2], bit_width=8)
    stats2 = q2.optimize()
    assert stats2["fuse_attention"] == 1
    assert stats2["fusion_failures"] == []


def _foreign_attention_graph(b, n, hd, heads, *, prescaled, div_form=False):
    """A multi-head self-attention graph in a NON-torch exporter style:
    plain 4-dim shape constants for the head-split Reshapes (no
    Concat(batch, tail) chain), the key side as ONE composed
    Transpose(0,2,3,1), and -- when ``prescaled`` -- the 1/sqrt(d)
    folded into the q weights with Softmax fed straight by the score
    MatMul. Otherwise the scale is a Mul/Div by a scalar INITIALIZER
    (not a Constant node)."""
    from numpy_quant_tpu import onnx as O

    rng = np.random.default_rng(11)  # own stream: keep RNG draws stable
    d = hd // heads
    scal = float(np.sqrt(d))
    wq = rng.normal(size=(hd, hd)).astype(np.float32)
    if prescaled:
        wq /= np.float32(scal)
    nodes = [
        O.make_node("MatMul", ["x", "wq"], ["q0"], name="pq"),
        O.make_node("MatMul", ["x", "wk"], ["k0"], name="pk"),
        O.make_node("MatMul", ["x", "wv"], ["v0"], name="pv"),
        O.make_node("Add", ["q0", "bq"], ["q"], name="aq"),
        O.make_node("Add", ["k0", "bk"], ["k"], name="ak"),
        O.make_node("Add", ["v0", "bv"], ["v"], name="av"),
        O.make_node("Reshape", ["q", "shape4"], ["q4"], name="rq"),
        O.make_node("Reshape", ["k", "shape4"], ["k4"], name="rk"),
        O.make_node("Reshape", ["v", "shape4"], ["v4"], name="rv"),
        O.make_node("Transpose", ["q4"], ["qh"], name="tq",
                    perm=[0, 2, 1, 3]),
        # composed single key transpose (not the torch two-step)
        O.make_node("Transpose", ["k4"], ["kh"], name="tk",
                    perm=[0, 2, 3, 1]),
        O.make_node("Transpose", ["v4"], ["vh"], name="tv",
                    perm=[0, 2, 1, 3]),
        O.make_node("MatMul", ["qh", "kh"], ["scores"], name="ms"),
    ]
    sm_in = "scores"
    if not prescaled:
        nodes.append(O.make_node("Div" if div_form else "Mul",
                                 ["scores", "scal"], ["scaled"],
                                 name="sc"))
        sm_in = "scaled"
    nodes += [
        O.make_node("Softmax", [sm_in], ["probs"], name="sm", axis=-1),
        O.make_node("MatMul", ["probs", "vh"], ["ctx"], name="mc"),
        O.make_node("Transpose", ["ctx"], ["ctx2"], name="tc",
                    perm=[0, 2, 1, 3]),
        O.make_node("Reshape", ["ctx2", "shape3"], ["y"], name="ro"),
    ]
    init = [
        O.from_array(wq, "wq"),
        O.from_array(rng.normal(size=(hd, hd)).astype(np.float32), "wk"),
        O.from_array(rng.normal(size=(hd, hd)).astype(np.float32), "wv"),
        O.from_array(rng.normal(size=(hd,)).astype(np.float32), "bq"),
        O.from_array(rng.normal(size=(hd,)).astype(np.float32), "bk"),
        O.from_array(rng.normal(size=(hd,)).astype(np.float32), "bv"),
        O.from_array(np.array([b, n, heads, d], dtype=np.int64), "shape4"),
        O.from_array(np.array([b, n, hd], dtype=np.int64), "shape3"),
    ]
    if not prescaled:
        init.append(O.from_array(
            np.float32(scal if div_form else 1.0 / scal), "scal"))
    g = O.make_graph(
        nodes, "foreign_attention",
        [O.make_tensor_value_info("x", O.TensorProto.FLOAT, [b, n, hd])],
        [O.make_tensor_value_info("y", O.TensorProto.FLOAT, None)],
        initializer=init)
    return O.make_model(g)


@pytest.mark.parametrize("prescaled", [True, False])
def test_fuse_attention_foreign_exporter_pattern(prescaled):
    """The head-split matcher covers non-torch exporter idioms
    (VERDICT r2 weak #8): plain 4-dim Reshape shape constants, the
    composed (0,2,3,1) key transpose, scalar-initializer scale values
    (dequantized when the PTQ pass quantized them), and pre-scaled-q
    graphs with no Mul/Div before Softmax at all. Fusion must hit the
    head-splitting kernel and stay bit-identical."""
    import numpy_quant_tpu as nq

    b, n, hd, heads = 2, 10, 16, 4
    m = _foreign_attention_graph(b, n, hd, heads, prescaled=prescaled)
    x = np.random.default_rng(12).normal(size=(b, n, hd)) \
        .astype(np.float32)
    qmodel = nq.Model.from_onnx(m).quantize([x], bit_width=8)
    ref = qmodel([x])[0]
    assert qmodel.fuse_attention() == 1
    assert qmodel.fusion_report["failures"] == []
    fa = [nd for nd in qmodel.nodes if nd.op == "FusedAttentionHS"]
    assert len(fa) == 1 and int(fa[0].attrs["num_heads"]) == heads
    # the head shuffles were swallowed into the kernel
    assert not any(nd.op in ("Transpose", "Softmax") for nd in qmodel.nodes)
    np.testing.assert_array_equal(qmodel([x])[0], ref)


def test_fuse_attention_split_qkv_pattern():
    """ONE wide QKV projection + Split(axis=-1), as some HF exports
    emit (ROADMAP item 5): the matcher anchors on the Reshape/Transpose
    chains, not the q/k/v producers, so the Split form fuses too (the
    Split node itself stays in the graph, slicing the wide projection).
    Bit-identical to the unfused executor."""
    import numpy_quant_tpu as nq
    from numpy_quant_tpu import onnx as O

    b, n, hd, heads = 2, 10, 16, 4
    d = hd // heads
    rng = np.random.default_rng(21)
    nodes = [
        O.make_node("MatMul", ["x", "wqkv"], ["qkv0"], name="proj"),
        O.make_node("Add", ["qkv0", "bqkv"], ["qkv"], name="bias"),
        O.make_node("Split", ["qkv"], ["q", "k", "v"], name="split",
                    axis=-1, num_outputs=3),
        O.make_node("Reshape", ["q", "shape4"], ["q4"], name="rq"),
        O.make_node("Reshape", ["k", "shape4"], ["k4"], name="rk"),
        O.make_node("Reshape", ["v", "shape4"], ["v4"], name="rv"),
        O.make_node("Transpose", ["q4"], ["qh"], name="tq",
                    perm=[0, 2, 1, 3]),
        O.make_node("Transpose", ["k4"], ["kh"], name="tk",
                    perm=[0, 2, 3, 1]),
        O.make_node("Transpose", ["v4"], ["vh"], name="tv",
                    perm=[0, 2, 1, 3]),
        O.make_node("MatMul", ["qh", "kh"], ["scores"], name="ms"),
        O.make_node("Mul", ["scores", "scal"], ["scaled"], name="sc"),
        O.make_node("Softmax", ["scaled"], ["probs"], name="sm", axis=-1),
        O.make_node("MatMul", ["probs", "vh"], ["ctx"], name="mc"),
        O.make_node("Transpose", ["ctx"], ["ctx2"], name="tc",
                    perm=[0, 2, 1, 3]),
        O.make_node("Reshape", ["ctx2", "shape3"], ["y"], name="ro"),
    ]
    init = [
        O.from_array(rng.normal(size=(hd, 3 * hd)).astype(np.float32),
                     "wqkv"),
        O.from_array(rng.normal(size=(3 * hd,)).astype(np.float32),
                     "bqkv"),
        O.from_array(np.array([b, n, heads, d], dtype=np.int64), "shape4"),
        O.from_array(np.array([b, n, hd], dtype=np.int64), "shape3"),
        O.from_array(np.float32(1.0 / np.sqrt(d)), "scal"),
    ]
    g = O.make_graph(
        nodes, "split_qkv_attention",
        [O.make_tensor_value_info("x", O.TensorProto.FLOAT, [b, n, hd])],
        [O.make_tensor_value_info("y", O.TensorProto.FLOAT, None)],
        initializer=init)
    m = O.make_model(g)

    x = np.random.default_rng(22).normal(size=(b, n, hd)) \
        .astype(np.float32)
    qmodel = nq.Model.from_onnx(m).quantize([x], bit_width=8)
    ref = qmodel([x])[0]
    assert qmodel.fuse_attention() == 1
    assert qmodel.fusion_report["failures"] == []
    ops = [nd.op for nd in qmodel.nodes]
    assert "FusedAttentionHS" in ops and "Split" in ops
    assert not any(o in ("Transpose", "Softmax") for o in ops)
    np.testing.assert_array_equal(qmodel([x])[0], ref)


def _hs_attention_oracle(xq, xk, xv, H, scaling, sq, zq, sk, zk, sv, zv,
                         sp, zp_p, out_requant=None, bias=None):
    """Unfused per-head reference math (q_matmul/softmax/quantize).
    ``bias`` is an optional per-head additive score constant [H, N, N]
    (the graph's Add before Softmax -- T5 relative position bias)."""
    from numpy_quant_tpu.quantization import (
        dequantize as dq_, q_matmul, quantize as q_)

    B, N, HD = xq.shape
    D = HD // H
    expect = np.zeros((B, N, HD), np.float32 if out_requant is None
                      else np.int64)
    for b in range(B):
        for h in range(H):
            sl = slice(h * D, (h + 1) * D)
            qh = xq[b][:, sl].astype(np.int64)
            kh = xk[b][:, sl].astype(np.int64)
            vh = xv[b][:, sl].astype(np.int64)
            acc, scale, zp = q_matmul(jnp.asarray(qh), np.float32(sq),
                                      np.int64(zq), jnp.asarray(kh.T),
                                      np.float32(sk), np.int64(zk),
                                      bit_width=8)
            s = np.asarray(dq_(acc, scale, zp)) * np.float32(scaling)
            if bias is not None:
                s = s + bias[h]
            e = np.exp(s - s.max(-1, keepdims=True))
            probs = (e / e.sum(-1, keepdims=True)).astype(np.float32)
            pq = np.asarray(q_(probs, 8, np.float32(sp), np.int64(zp_p)))
            acc2, scale2, zp2 = q_matmul(jnp.asarray(pq), np.float32(sp),
                                         np.int64(zp_p), jnp.asarray(vh),
                                         np.float32(sv), np.int64(zv),
                                         bit_width=8)
            y = np.asarray(dq_(acc2, scale2, zp2))
            if out_requant is None:
                expect[b][:, sl] = y
            else:
                expect[b][:, sl] = np.asarray(
                    q_(y, 8, np.float32(out_requant[0]),
                       np.int64(out_requant[1])))
    return expect


def test_blockwise_attention_hs_bit_identical_to_monolithic():
    """The q-row-blocked grid (flash-style long-sequence path) returns
    the SAME bits as the monolithic kernel: every output row sees the
    identical full-row reductions."""
    from numpy_quant_tpu.kernels.attention import fused_attention_hs

    B, N, H, D = 2, 50, 4, 8
    kw = dict(num_heads=H, scaling=0.4, sq=0.02, zq=3, sk=0.03, zk=-2,
              sv=0.05, zv=4, sp=1 / 255., zp_p=-128, bit_width=8,
              interpret=jax.default_backend() == "cpu")
    rng = np.random.default_rng(1)
    xq = rng.integers(-100, 100, size=(B, N, H * D)).astype(np.int8)
    xk = rng.integers(-100, 100, size=(B, N, H * D)).astype(np.int8)
    xv = rng.integers(-100, 100, size=(B, N, H * D)).astype(np.int8)

    mono = np.asarray(fused_attention_hs(xq, xk, xv, **kw))
    blocked = np.asarray(fused_attention_hs(xq, xk, xv, block_q=16, **kw))
    np.testing.assert_array_equal(mono, blocked)
    # the fp-tolerance fast path blocks identically too
    mono_f = np.asarray(fused_attention_hs(xq, xk, xv, fast=True, **kw))
    blocked_f = np.asarray(fused_attention_hs(xq, xk, xv, fast=True,
                                              block_q=16, **kw))
    np.testing.assert_array_equal(mono_f, blocked_f)


def test_fused_attention_hs_causal():
    """causal_mask_val: the decoder's additive triangular mask applies
    inside the kernel bit-identically to the unfused math, on the
    monolithic AND the q-row-blocked grid (whose tiles must index rows
    by absolute position)."""
    from numpy_quant_tpu.kernels.attention import fused_attention_hs
    from numpy_quant_tpu.quantization import dequantize as dq_
    from numpy_quant_tpu.quantization import q_matmul
    from numpy_quant_tpu.quantization import quantize as q_

    B, N, H, D = 2, 12, 2, 8
    sq, zq, sk, zk, sv, zv = 0.02, 3, 0.03, -2, 0.05, 4
    sp, zp_p = 1 / 255., -128
    M = float(np.float32(-3.2e8))  # a dequantized -1e9-style mask value
    rng = np.random.default_rng(5)
    xq = rng.integers(-100, 100, size=(B, N, H * D)).astype(np.int8)
    xk = rng.integers(-100, 100, size=(B, N, H * D)).astype(np.int8)
    xv = rng.integers(-100, 100, size=(B, N, H * D)).astype(np.int8)
    kw = dict(num_heads=H, scaling=0.5, sq=sq, zq=zq, sk=sk, zk=zk, sv=sv,
              zv=zv, sp=sp, zp_p=zp_p, bit_width=8, causal_mask_val=M,
              interpret=jax.default_backend() == "cpu")

    out = np.asarray(fused_attention_hs(xq, xk, xv, **kw))

    mask = np.triu(np.full((N, N), np.float32(M), np.float32), k=1)
    expect = np.zeros((B, N, H * D), np.float32)
    for b in range(B):
        for h in range(H):
            sl = slice(h * D, (h + 1) * D)
            acc, scale, zp = q_matmul(
                jnp.asarray(xq[b][:, sl].astype(np.int64)), np.float32(sq),
                np.int64(zq), jnp.asarray(xk[b][:, sl].astype(np.int64).T),
                np.float32(sk), np.int64(zk), bit_width=8)
            s = np.asarray(dq_(acc, scale, zp)) * np.float32(0.5) + mask
            e = np.exp(s - s.max(-1, keepdims=True))
            probs = (e / e.sum(-1, keepdims=True)).astype(np.float32)
            pq = np.asarray(q_(probs, 8, np.float32(sp), np.int64(zp_p)))
            acc2, scale2, zp2 = q_matmul(
                jnp.asarray(pq), np.float32(sp), np.int64(zp_p),
                jnp.asarray(xv[b][:, sl].astype(np.int64)), np.float32(sv),
                np.int64(zv), bit_width=8)
            expect[b][:, sl] = np.asarray(dq_(acc2, scale2, zp2))
    np.testing.assert_array_equal(out, expect)

    # row 0 attends only to itself: context row 0 == dequant(v row 0)
    # (probability 1 quantizes to 1/sp + zp)
    blocked = np.asarray(fused_attention_hs(xq, xk, xv, block_q=8, **kw))
    np.testing.assert_array_equal(out, blocked)
    # fast path: same mask semantics within fp tolerance
    fast = np.asarray(fused_attention_hs(xq, xk, xv, fast=True, **kw))
    fast_b = np.asarray(fused_attention_hs(xq, xk, xv, fast=True,
                                           block_q=8, **kw))
    np.testing.assert_array_equal(fast, fast_b)
    np.testing.assert_allclose(fast, out, atol=2e-2)


def test_fused_attention_hs_score_bias():
    """score_bias: a per-head additive score tensor (T5 relative
    position bias / ALiBi / sliding-window masks) applies inside the
    kernel bit-identically to the unfused math, on the monolithic AND
    the q-row-blocked grid (whose bias rows tile with the q tiles)."""
    from numpy_quant_tpu.kernels.attention import fused_attention_hs

    B, N, H, D = 2, 20, 3, 8
    kw = dict(num_heads=H, scaling=0.35, sq=0.02, zq=3, sk=0.03, zk=-2,
              sv=0.05, zv=4, sp=1 / 255., zp_p=-128, bit_width=8,
              interpret=jax.default_backend() == "cpu")
    rng = np.random.default_rng(9)
    xq = rng.integers(-100, 100, size=(B, N, H * D)).astype(np.int8)
    xk = rng.integers(-100, 100, size=(B, N, H * D)).astype(np.int8)
    xv = rng.integers(-100, 100, size=(B, N, H * D)).astype(np.int8)
    bias = (rng.normal(size=(H, N, N)) * 2.0).astype(np.float32)

    expect = _hs_attention_oracle(xq, xk, xv, H, kw["scaling"], kw["sq"],
                                  kw["zq"], kw["sk"], kw["zk"], kw["sv"],
                                  kw["zv"], kw["sp"], kw["zp_p"],
                                  bias=bias)
    out = np.asarray(fused_attention_hs(xq, xk, xv, jnp.asarray(bias),
                                        **kw))
    np.testing.assert_array_equal(out, expect)
    blocked = np.asarray(fused_attention_hs(xq, xk, xv, jnp.asarray(bias),
                                            block_q=8, **kw))
    np.testing.assert_array_equal(blocked, expect)

    # fast path (with and without the static exp2 shift): same values
    # within fp tolerance; blockwise == monolithic exactly
    fast = np.asarray(fused_attention_hs(xq, xk, xv, jnp.asarray(bias),
                                         fast=True, **kw))
    np.testing.assert_allclose(fast, expect, atol=2e-2)
    fast_b = np.asarray(fused_attention_hs(xq, xk, xv, jnp.asarray(bias),
                                           fast=True, block_q=8, **kw))
    np.testing.assert_array_equal(fast, fast_b)
    fast_s = np.asarray(fused_attention_hs(xq, xk, xv, jnp.asarray(bias),
                                           fast=True, score_max=3.0, **kw))
    np.testing.assert_allclose(fast_s, expect, atol=2e-2)

    # an ALiBi-shaped bias (row-broadcast [H, 1, N] slopes)
    slopes = (0.5 ** (np.arange(1, H + 1)))[:, None, None]
    alibi = (slopes * -np.abs(np.arange(N, dtype=np.float32))[None, None])
    alibi = np.broadcast_to(alibi, (H, N, N)).astype(np.float32)
    expect_a = _hs_attention_oracle(xq, xk, xv, H, kw["scaling"], kw["sq"],
                                    kw["zq"], kw["sk"], kw["zk"], kw["sv"],
                                    kw["zv"], kw["sp"], kw["zp_p"],
                                    bias=alibi)
    out_a = np.asarray(fused_attention_hs(xq, xk, xv, jnp.asarray(alibi),
                                          **kw))
    np.testing.assert_array_equal(out_a, expect_a)


def test_fused_attention_hs_sliding_window():
    """causal_window (Mistral-style banded causal mask): bit-identical
    to the unfused banded-mask math on the monolithic and q-row-blocked
    grids, exact and fast paths, and on the PLAIN kernel."""
    from numpy_quant_tpu.kernels.attention import (fused_attention,
                                                   fused_attention_hs)

    B, N, H, D = 2, 20, 2, 8
    W = 5
    M = float(np.float32(-3.2e8))
    kw = dict(num_heads=H, scaling=0.35, sq=0.02, zq=3, sk=0.03, zk=-2,
              sv=0.05, zv=4, sp=1 / 255., zp_p=-128, bit_width=8,
              causal_mask_val=M, causal_window=W,
              interpret=jax.default_backend() == "cpu")
    rng = np.random.default_rng(13)
    xq = rng.integers(-100, 100, size=(B, N, H * D)).astype(np.int8)
    xk = rng.integers(-100, 100, size=(B, N, H * D)).astype(np.int8)
    xv = rng.integers(-100, 100, size=(B, N, H * D)).astype(np.int8)

    i, j = np.indices((N, N))
    band = np.where((j <= i) & (j > i - W), np.float32(0),
                    np.float32(M))
    expect = _hs_attention_oracle(
        xq, xk, xv, H, kw["scaling"], kw["sq"], kw["zq"], kw["sk"],
        kw["zk"], kw["sv"], kw["zv"], kw["sp"], kw["zp_p"],
        bias=np.broadcast_to(band, (H, N, N)))
    out = np.asarray(fused_attention_hs(xq, xk, xv, **kw))
    np.testing.assert_array_equal(out, expect)
    blocked = np.asarray(fused_attention_hs(xq, xk, xv, block_q=8, **kw))
    np.testing.assert_array_equal(blocked, expect)
    fast = np.asarray(fused_attention_hs(xq, xk, xv, fast=True, **kw))
    np.testing.assert_allclose(fast, expect, atol=2e-2)

    # plain kernel (the llama/mistral fusion path): per-head layout
    q4 = np.ascontiguousarray(
        xq.reshape(B, N, H, D).transpose(0, 2, 1, 3)).reshape(-1, N, D)
    k4 = np.ascontiguousarray(
        xk.reshape(B, N, H, D).transpose(0, 2, 3, 1)).reshape(-1, D, N)
    v4 = np.ascontiguousarray(
        xv.reshape(B, N, H, D).transpose(0, 2, 1, 3)).reshape(-1, N, D)
    kwp = dict(kw)
    kwp.pop("num_heads")
    outp = np.asarray(fused_attention(q4, k4, v4, **kwp))
    expect_p = expect.reshape(B, N, H, D).transpose(0, 2, 1, 3) \
        .reshape(-1, N, D)
    np.testing.assert_array_equal(outp, expect_p)


def test_blockwise_attention_hs_long_sequence():
    """N=4096: the monolithic layout would need [rows, 4096] x 4096 f32
    score temps (>190 MB VMEM) and cannot run; the auto-selected
    blockwise grid streams q rows and matches the unfused graph math."""
    from numpy_quant_tpu.kernels.attention import (
        _BLOCKWISE_N, fused_attention_hs)

    B, N, H, D = 1, 4096, 2, 64
    assert N >= _BLOCKWISE_N  # auto-dispatch must pick the blockwise grid
    sq, zq, sk, zk, sv, zv = 0.02, 3, 0.03, -2, 0.05, 4
    sp, zp_p = 1 / 255., -128
    rng = np.random.default_rng(2)
    xq = rng.integers(-100, 100, size=(B, N, H * D)).astype(np.int8)
    xk = rng.integers(-100, 100, size=(B, N, H * D)).astype(np.int8)
    xv = rng.integers(-100, 100, size=(B, N, H * D)).astype(np.int8)

    out = np.asarray(fused_attention_hs(
        xq, xk, xv, num_heads=H, scaling=1 / 8., sq=sq, zq=zq, sk=sk,
        zk=zk, sv=sv, zv=zv, sp=sp, zp_p=zp_p, bit_width=8,
        interpret=jax.default_backend() == "cpu"))
    expect = _hs_attention_oracle(xq, xk, xv, H, 1 / 8., sq, zq, sk, zk,
                                  sv, zv, sp, zp_p)
    # fp tolerance: at this width f32 softmax reduction trees differ by
    # ulps, occasionally flipping a probs rint bucket (one quant step)
    np.testing.assert_allclose(out, expect, atol=5e-2)
    assert np.mean(np.abs(out - expect)) < 2e-3


@pytest.mark.parametrize("fast", [False, True])
@pytest.mark.parametrize("n", [50, 128])  # 128: no lane pad, no hijack
def test_narrow_q_attention_matches_full_rows(fast, n):
    """xq with fewer tokens than K/V (dead-token elimination feeds ONE
    gathered query row against full K/V on the last ViT layer): row i
    of the narrow call is bit-identical to row i of the full call, on
    both kernel paths, with and without the requantize epilogue."""
    from numpy_quant_tpu.kernels.attention import fused_attention_hs

    B, H, D = 4, 4, 8
    kw = dict(num_heads=H, scaling=0.4, sq=0.02, zq=3, sk=0.03, zk=-2,
              sv=0.05, zv=4, sp=1 / 255., zp_p=-128, bit_width=8,
              fast=fast, interpret=jax.default_backend() == "cpu")
    rng = np.random.default_rng(5)
    xq = rng.integers(-100, 100, size=(B, n, H * D)).astype(np.int8)
    xk = rng.integers(-100, 100, size=(B, n, H * D)).astype(np.int8)
    xv = rng.integers(-100, 100, size=(B, n, H * D)).astype(np.int8)

    full = np.asarray(fused_attention_hs(xq, xk, xv, **kw))
    one = np.asarray(fused_attention_hs(xq[:, :1], xk, xv, **kw))
    np.testing.assert_array_equal(one, full[:, :1])
    few = np.asarray(fused_attention_hs(xq[:, :3], xk, xv, **kw))
    np.testing.assert_array_equal(few, full[:, :3])
    # fused requantize epilogue (the int8_dataflow serving shape)
    rq = dict(kw, out_requant=(0.11, 7))
    fullq = np.asarray(fused_attention_hs(xq, xk, xv, **rq))
    oneq = np.asarray(fused_attention_hs(xq[:, :1], xk, xv, **rq))
    np.testing.assert_array_equal(oneq, fullq[:, :1])


def test_blockwise_attention_plain_long_sequence():
    """The non-head-split FusedAttention kernel blocks q rows too."""
    from numpy_quant_tpu.kernels.attention import fused_attention
    from numpy_quant_tpu.quantization import (
        dequantize as dq_, q_matmul, quantize as q_)

    BH, N, D = 2, 1536, 64
    sq, zq, sk, zk, sv, zv = 0.02, 3, 0.03, -2, 0.05, 0
    sp, zp_p = 1 / 255., -128
    rng = np.random.default_rng(3)
    q = rng.integers(-100, 100, size=(BH, N, D)).astype(np.int8)
    kt = rng.integers(-100, 100, size=(BH, D, N)).astype(np.int8)
    v = rng.integers(-100, 100, size=(BH, N, D)).astype(np.int8)

    out = np.asarray(fused_attention(
        q, kt, v, scaling=1 / 8., sq=sq, zq=zq, sk=sk, zk=zk, sv=sv,
        zv=zv, sp=sp, zp_p=zp_p, bit_width=8,
        interpret=jax.default_backend() == "cpu"))
    expect = np.zeros((BH, N, D), np.float32)
    for b in range(BH):
        acc, scale, zp = q_matmul(jnp.asarray(q[b].astype(np.int64)),
                                  np.float32(sq), np.int64(zq),
                                  jnp.asarray(kt[b].astype(np.int64)),
                                  np.float32(sk), np.int64(zk), bit_width=8)
        s = np.asarray(dq_(acc, scale, zp)) * np.float32(1 / 8.)
        e = np.exp(s - s.max(-1, keepdims=True))
        probs = (e / e.sum(-1, keepdims=True)).astype(np.float32)
        pq = np.asarray(q_(probs, 8, np.float32(sp), np.int64(zp_p)))
        acc2, scale2, zp2 = q_matmul(jnp.asarray(pq), np.float32(sp),
                                     np.int64(zp_p),
                                     jnp.asarray(v[b].astype(np.int64)),
                                     np.float32(sv), np.int64(zv),
                                     bit_width=8)
        expect[b] = np.asarray(dq_(acc2, scale2, zp2))
    np.testing.assert_allclose(out, expect, atol=2e-2)
    assert np.mean(np.abs(out - expect)) < 2e-3


def test_fast_attention_static_shift_matches_max_subtract():
    """The calibrated static exp2 shift (no per-row max reduce) equals
    the max-subtracted fast softmax up to f32 rounding, and the exact
    path ignores score_max entirely."""
    from numpy_quant_tpu.kernels.attention import fused_attention_hs

    B, N, H, D = 2, 29, 2, 64
    rng = np.random.default_rng(5)
    xq = rng.integers(-100, 100, size=(B, N, H * D)).astype(np.int8)
    xk = rng.integers(-100, 100, size=(B, N, H * D)).astype(np.int8)
    xv = rng.integers(-100, 100, size=(B, N, H * D)).astype(np.int8)
    kw = dict(num_heads=H, scaling=0.125, sq=0.02, zq=3, sk=0.03, zk=-2,
              sv=0.05, zv=4, sp=1 / 255., zp_p=-128, bit_width=8,
              interpret=jax.default_backend() == "cpu")
    # a realistic calibrated bound: the largest dequantized score
    smax = 127 * 0.02 * 127 * 0.03 * 64 * 0.125
    base = np.asarray(fused_attention_hs(xq, xk, xv, fast=True, **kw))
    shifted = np.asarray(fused_attention_hs(xq, xk, xv, fast=True,
                                            score_max=smax, **kw))
    # same probs up to f32 rounding -> occasional one-step rint flips
    # (the worst case: this test's shift sits ~112 bits above the
    # actual row maxes, far harsher than calibrated stats would be)
    close = np.isclose(base, shifted, atol=np.float32(0.05))
    assert close.mean() > 0.995
    assert np.mean(np.abs(base - shifted)) < 0.02

    exact = np.asarray(fused_attention_hs(xq, xk, xv, fast=False, **kw))
    exact2 = np.asarray(fused_attention_hs(xq, xk, xv, fast=False,
                                           score_max=smax, **kw))
    np.testing.assert_array_equal(exact, exact2)


def test_fuse_attention_records_score_max():
    """fuse_attention stores the calibrated softmax-input max so the
    serving kernel can use the static-shift softmax."""
    import numpy_quant_tpu as nq
    from numpy_quant_tpu.models import vit as V

    m = V.vit_self_attention(2, 10, 16, 4)
    x = RNG.normal(size=(2, 10, 16)).astype(np.float32)
    qmodel = nq.Model.from_onnx(m).quantize([x], bit_width=8)
    assert qmodel.fuse_attention() == 1
    fnode = [n for n in qmodel.nodes
             if n.op in ("FusedAttention", "FusedAttentionHS")][0]
    assert "score_max" in fnode.attrs
    assert np.isfinite(fnode.attrs["score_max"])
    # the fused executor still runs under the bf16 serving mode
    from numpy_quant_tpu import config as nq_config
    import jax.numpy as jnp
    try:
        nq_config.float_dtype = jnp.bfloat16
        prev = nq_config.float_matmul_precision
        nq_config.float_matmul_precision = jax.lax.Precision.DEFAULT
        qmodel._jit_cache.clear()
        out = qmodel([x])[0]
        assert np.all(np.isfinite(out))
    finally:
        nq_config.float_dtype = jnp.float32
        nq_config.float_matmul_precision = prev
        qmodel._jit_cache.clear()


def test_fuse_gelu_bit_exact_f32_and_close_bf16():
    """fuse_gelu: the FusedGelu node replays the exporter's exact GELU
    chain bit-for-bit in f32 mode, and the bf16 sigmoid form stays
    within serving tolerance; composed with the other optimize passes
    on a small ViT."""
    import numpy_quant_tpu as nq
    from numpy_quant_tpu import config as nq_config
    from numpy_quant_tpu.models import vit as V

    m = V.vit(2, 16, 4, 24, 16, 4)
    x = RNG.normal(size=(2, 3, 16, 16)).astype(np.float32)
    model = nq.Model.from_onnx(m)
    qmodel = model.quantize([x], bit_width=8)
    ref = qmodel([x])[0]
    n_gelu = qmodel.fuse_gelu()
    assert n_gelu == 2  # one per encoder layer
    assert not any(n.op == "Erf" for n in qmodel.nodes)
    out = qmodel([x])[0]
    np.testing.assert_array_equal(out, ref)  # exact f32 replay

    # full optimize() composition still fuses attention too
    q2 = model.quantize([x], bit_width=8)
    stats = q2.optimize()
    assert stats["fuse_gelu"] == 2 and stats["fuse_attention"] == 2
    np.testing.assert_array_equal(q2([x])[0], ref)

    # bf16 serving mode: sigmoid-form GELU within int8-noise tolerance
    with nq_config.low_precision_floats():
        q2._jit_cache.clear()
        out_bf = q2([x])[0]
    q2._jit_cache.clear()
    denom = float(ref.max() - ref.min())
    assert np.abs(out_bf - ref).mean() / denom < 0.01
    assert np.array_equal(out_bf.argmax(1), ref.argmax(1))


def test_blockwise_attention_plain_causal_long_sequence():
    """Causal mask under the q-row-blocked plain grid: each block's
    rows must mask columns by their ABSOLUTE position (program_id
    offset), not the in-block row index. Verified against the unfused
    float math with the mask added exactly where the executor's
    Add(mask) sits."""
    from numpy_quant_tpu.kernels.attention import fused_attention
    from numpy_quant_tpu.quantization import (
        dequantize as dq_, q_matmul, quantize as q_)

    BH, N, D = 2, 1536, 64
    sq, zq, sk, zk, sv, zv = 0.02, 3, 0.03, -2, 0.05, 0
    sp, zp_p = 1 / 255., -128
    mask_val = -1e9
    rng = np.random.default_rng(11)
    q = rng.integers(-100, 100, size=(BH, N, D)).astype(np.int8)
    kt = rng.integers(-100, 100, size=(BH, D, N)).astype(np.int8)
    v = rng.integers(-100, 100, size=(BH, N, D)).astype(np.int8)

    out = np.asarray(fused_attention(
        q, kt, v, scaling=1 / 8., sq=sq, zq=zq, sk=sk, zk=zk, sv=sv,
        zv=zv, sp=sp, zp_p=zp_p, bit_width=8,
        causal_mask_val=mask_val,
        interpret=jax.default_backend() == "cpu"))
    tri = np.triu(np.full((N, N), np.float32(mask_val)), k=1)
    expect = np.zeros((BH, N, D), np.float32)
    for b in range(BH):
        acc, scale, zp = q_matmul(jnp.asarray(q[b].astype(np.int64)),
                                  np.float32(sq), np.int64(zq),
                                  jnp.asarray(kt[b].astype(np.int64)),
                                  np.float32(sk), np.int64(zk), bit_width=8)
        s = np.asarray(dq_(acc, scale, zp)) * np.float32(1 / 8.) + tri
        e = np.exp(s - s.max(-1, keepdims=True))
        probs = (e / e.sum(-1, keepdims=True)).astype(np.float32)
        pq = np.asarray(q_(probs, 8, np.float32(sp), np.int64(zp_p)))
        acc2, scale2, zp2 = q_matmul(jnp.asarray(pq), np.float32(sp),
                                     np.int64(zp_p),
                                     jnp.asarray(v[b].astype(np.int64)),
                                     np.float32(sv), np.int64(zv),
                                     bit_width=8)
        expect[b] = np.asarray(dq_(acc2, scale2, zp2))
    np.testing.assert_allclose(out, expect, atol=2e-2)
    assert np.mean(np.abs(out - expect)) < 2e-3
    # row 0 attends only to itself; a fully-masked-off column pattern
    # would show up as NaNs -- assert clean
    assert np.isfinite(out).all()

@pytest.mark.parametrize("bits,K,N,M,g", [
    (4, 256, 96, 7, 1), (4, 256, 96, 7, 4), (2, 128, 64, 5, 2),
    (8, 200, 50, 3, 1), (1, 256, 64, 4, 2), (4, 384, 130, 9, 6),
])
def test_splitk_wo_matmul_matches_dequant_dot(bits, K, N, M, g):
    """Weight-only split-K kernel (grouped-scale fused dequant): same
    numbers as x @ (W * expand(scale)) -- the dequantize-then-dot
    semantics -- for per-tensor/per-channel (g=1), per-field-tiling
    groups, field-spanning groups (g < r), and padded K/N edges."""
    from numpy_quant_tpu.kernels.pack import pack_splitk
    from numpy_quant_tpu.kernels.qmatmul import splitk_wo_matmul

    lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    w = RNG.integers(lo, hi + 1, size=(K, N)).astype(np.int8)
    s = np.abs(RNG.normal(size=(g, N))).astype(np.float32)
    x = RNG.normal(size=(M, K)).astype(np.float32)
    want = x @ (w.astype(np.float32) * np.repeat(s, K // g, axis=0))
    packed = jnp.asarray(w) if bits == 8 \
        else jnp.asarray(pack_splitk(w, bits))
    got = np.asarray(splitk_wo_matmul(
        jnp.asarray(x), packed, jnp.asarray(s), bits=bits,
        interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_splitk_wo_matmul_bf16_and_infeasible_groups():
    from numpy_quant_tpu.kernels.pack import pack_splitk
    from numpy_quant_tpu.kernels.qmatmul import splitk_wo_matmul

    w = RNG.integers(-8, 8, size=(256, 128)).astype(np.int8)
    s = np.abs(RNG.normal(size=(2, 128))).astype(np.float32)
    x = RNG.normal(size=(16, 256)).astype(np.float32)
    got = splitk_wo_matmul(jnp.asarray(x, jnp.bfloat16),
                           jnp.asarray(pack_splitk(w, 4)),
                           jnp.asarray(s), bits=4, interpret=True)
    assert got.dtype == jnp.bfloat16
    want = x @ (w.astype(np.float32) * np.repeat(s, 128, axis=0))
    # bf16 dot: ~0.4% relative precision, sums near zero need the atol
    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               rtol=0.05, atol=1.5)

    # groups that tile neither within nor across fields are rejected
    w3 = RNG.integers(-8, 8, size=(384, 128)).astype(np.int8)
    s3 = np.abs(RNG.normal(size=(3, 128))).astype(np.float32)  # gsz 128, kr 192
    with pytest.raises(ValueError, match="group_size"):
        splitk_wo_matmul(jnp.asarray(x[:, :384].copy()) if x.shape[1] >= 384
                         else jnp.asarray(RNG.normal(size=(16, 384)),
                                          jnp.float32),
                         jnp.asarray(pack_splitk(w3, 4)),
                         jnp.asarray(s3), bits=4, interpret=True)


def test_weight_only_kernel_mode_end_to_end():
    """config.packed_execution='kernel' routes packed weight-only
    MatMuls through splitk_wo_matmul (ops/registry.py): same tokens as
    the hoisted-unpack execution on a packed+grouped GPT."""
    from numpy_quant_tpu import config as nq_config
    from numpy_quant_tpu.models.gpt import gpt_causal_lm
    import numpy_quant_tpu as nq

    proto = gpt_causal_lm(batch_size=2, seq_len=12, seed=0)
    model = nq.Model.from_onnx(proto)
    n = model.quantize_weights(bit_width=4, group_size=8)  # packed
    assert n > 0
    embeds = RNG.normal(size=(2, 12, 32)).astype(np.float32)
    base = np.asarray(model([embeds])[0])

    prev = nq_config.packed_execution
    nq_config.packed_execution = "kernel"
    try:
        model._jit_cache.clear()
        got = np.asarray(model([embeds])[0])
    finally:
        nq_config.packed_execution = prev
        model._jit_cache.clear()
    np.testing.assert_allclose(got, base, rtol=1e-4, atol=1e-5)
