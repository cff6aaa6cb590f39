"""Conv2d: our lax-based conv vs torch and vs the reference's im2col
engine (reference: test/test_conv2d.py, numpy_quant/numpy_helper.py:73-92).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from numpy_quant_tpu.ops.conv import (
    conv2d_im2col,
    conv2d_nchw,
    extract_sliding_windows_nhwc,
)

from .oracle import ref_numpy_helper, requires_reference

RNG = np.random.default_rng(0)


def _case():
    b, c, inp_shape = 2, 3, (9, 10)
    out_c, kernel_shape = 2, (3, 2)
    pads, strides = (0, 2, 2, 1), (2, 1)
    x = RNG.normal(size=(b, c, *inp_shape)).astype(np.float32)
    w = RNG.normal(size=(out_c, c, *kernel_shape)).astype(np.float32)
    bias = RNG.normal(size=out_c).astype(np.float32)
    return x, w, bias, pads, strides


def test_conv2d_vs_torch():
    torch = pytest.importorskip("torch")
    x, w, bias, pads, strides = _case()
    actual = np.asarray(conv2d_nchw(jnp.asarray(x), jnp.asarray(w),
                                    jnp.asarray(bias), pads, strides))
    tx = torch.nn.functional.pad(torch.tensor(x),
                                 (pads[1], pads[3], pads[0], pads[2]))
    desired = torch.nn.functional.conv2d(tx, torch.tensor(w),
                                         torch.tensor(bias),
                                         stride=strides).numpy()
    np.testing.assert_allclose(actual, desired, atol=1e-5)


@requires_reference
def test_conv2d_vs_reference_im2col():
    # reference oracle: numpy_helper.conv2d (stride-trick im2col + BLAS)
    ref = ref_numpy_helper()
    x, w, bias, pads, strides = _case()
    x_t = x.transpose(0, 2, 3, 1)
    w_t = w.transpose(2, 3, 1, 0)
    desired_t = ref.conv2d(x_t, w_t, pads, strides)
    desired = desired_t.transpose(0, 3, 1, 2) + bias.reshape(1, -1, 1, 1)
    actual = np.asarray(conv2d_nchw(jnp.asarray(x), jnp.asarray(w),
                                    jnp.asarray(bias), pads, strides))
    np.testing.assert_allclose(actual, desired, atol=1e-5)


@requires_reference
def test_sliding_windows_vs_reference():
    ref = ref_numpy_helper()
    x, w, bias, pads, strides = _case()
    x_t = x.transpose(0, 2, 3, 1)
    kh, kw = w.shape[2], w.shape[3]
    desired = ref.extract_sliding_windows(x_t, (kh, kw), pads, strides)
    b, oh, ow = desired.shape[:3]
    desired2d = desired.reshape(b, oh, ow, -1)  # [B,OH,OW,KH*KW*C]
    actual = np.asarray(extract_sliding_windows_nhwc(
        jnp.asarray(x_t), (kh, kw), pads, strides))
    np.testing.assert_allclose(actual, desired2d, atol=1e-6)


def test_conv2d_im2col_matches_direct():
    x, w, bias, pads, strides = _case()
    x_t = jnp.asarray(x.transpose(0, 2, 3, 1))
    w_t = jnp.asarray(w.transpose(2, 3, 1, 0))

    def mm(a, b):
        return jnp.matmul(a, b)

    y_t = conv2d_im2col(x_t, w_t, pads, strides, mm)
    actual = np.asarray(jnp.transpose(y_t, (0, 3, 1, 2)))
    desired = np.asarray(conv2d_nchw(jnp.asarray(x), jnp.asarray(w), None,
                                     pads, strides))
    np.testing.assert_allclose(actual, desired, atol=1e-4)


def test_integer_conv_quantized_model():
    """Integer conv path (parity-plus: reference runs quantized-graph
    Conv in float, SURVEY.md §3.4)."""
    import numpy_quant_tpu as nq
    from numpy_quant_tpu.models import testgen

    m = testgen.conv(b=2, c=3, inp_shape=(9, 10), out_c=2,
                     kernel_shape=(3, 2), pads=(0, 2, 2, 1), strides=(2, 1),
                     random_seed=0)
    model = nq.Model.from_onnx(m)
    x = RNG.normal(size=(2, 3, 9, 10)).astype(np.float32)
    f = model([x])[0]
    denom = f.max() - f.min()

    q_float_conv = model.quantize([x], bit_width=8)
    assert q_float_conv.quantized_ops == ("MatMul", "Gemm")
    of = q_float_conv([x])[0]
    assert np.mean(np.abs(of - f)) / denom < 0.05

    q_int_conv = model.quantize([x], bit_width=8, quantize_conv=True)
    assert "Conv" in q_int_conv.quantized_ops
    oi = q_int_conv([x])[0]
    assert np.mean(np.abs(oi - f)) / denom < 0.06

    # the integer path really produced integer conv accumulators
    q_int_conv([x], record=True)
    conv_out = next(v for v in q_int_conv.values if v.name == "output")
    assert isinstance(conv_out.data, nq.QTensor)


def test_integer_conv_vit_patch_embed():
    import numpy_quant_tpu as nq
    from numpy_quant_tpu.models import vit as V

    m = V.vit(2, 32, 8, 24, 16, 4)
    x = RNG.normal(size=(2, 3, 32, 32)).astype(np.float32)
    model = nq.Model.from_onnx(m)
    f = model([x])[0]
    qi = model.quantize([x], bit_width=8, quantize_conv=True)
    oi = qi([x])[0]
    assert np.mean(np.abs(oi - f)) <= 0.1
