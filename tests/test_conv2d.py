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
