"""TPU-mode numerics (x64 disabled): int32 containers, int8 MXU matmuls,
f32 scale math -- the exact configuration bench.py runs on hardware.
The rest of the suite runs in x64 exact mode; these tests pin down the
fast path."""
import numpy as np
import pytest

import jax

import numpy_quant_tpu as nq
from numpy_quant_tpu import quantization as Q
from numpy_quant_tpu.models import vit as V

RNG = np.random.default_rng(0)


@pytest.fixture(autouse=True)
def no_x64():
    with jax.enable_x64(False):
        yield


def _minmax(x):
    return (np.minimum(x.min(), np.float32(0.0)),
            np.maximum(x.max(), np.float32(0.0)))


@pytest.mark.parametrize("bits", [2, 4, 8])
def test_int8_matmul_integer_exact(bits):
    """For b<=8 the int8->int32 MXU path is integer-exact: compare the
    accumulator against a host int64 computation."""
    w = ((RNG.random((64, 48)).astype(np.float32)) - 0.5) * 4
    x = (RNG.random((32, 64)).astype(np.float32)) * 2
    sw, zw = Q.quant_parameters(*_minmax(w), bits, False)
    sx, zx = Q.quant_parameters(*_minmax(x), bits, True)
    qx = np.asarray(Q.quantize(x, bits, sx, zx))
    qw = np.asarray(Q.quantize(w, bits, sw, zw))
    assert qx.dtype == np.int32  # container dtype in TPU mode

    acc, scale, zp = Q.q_matmul(qx, sx, zx, qw, sw, zw, bit_width=bits)
    acc = np.asarray(acc)
    assert acc.dtype == np.int32
    desired = qx.astype(np.int64) @ qw.astype(np.int64)
    np.testing.assert_array_equal(acc.astype(np.int64), desired)
    corr = qw.astype(np.int64).sum(axis=0, keepdims=True) * int(zx)
    np.testing.assert_array_equal(np.asarray(zp).astype(np.int64), corr)


def test_wide_bit_width_f32_carrier():
    """9..16-bit operands use the float32 carrier on TPU (approximate,
    documented) -- result within f32 rounding of the exact int64 value."""
    bits = 12
    w = RNG.random((32, 24)).astype(np.float32) - 0.5
    x = RNG.random((16, 32)).astype(np.float32)
    sw, _ = Q.quant_parameters(*_minmax(w), bits, False)
    sx, _ = Q.quant_parameters(*_minmax(x), bits, False)
    qx = np.asarray(Q.quantize(x, bits, sx, None))
    qw = np.asarray(Q.quantize(w, bits, sw, None))
    acc, _, _ = Q.q_matmul(qx, sx, None, qw, sw, None, bit_width=bits)
    acc = np.asarray(acc)
    assert acc.dtype == np.float32
    desired = qx.astype(np.int64) @ qw.astype(np.int64)
    np.testing.assert_allclose(acc, desired.astype(np.float64), rtol=1e-6)


def test_quantized_vit_tpu_mode():
    """End-to-end int8 ViT in TPU-mode numerics stays within the
    reference error bound (0.1, reference: test_quantization.py:239)."""
    m = V.vit(4, 32, 8, 24, 16, 4)
    x = RNG.normal(size=(4, 3, 32, 32)).astype(np.float32)
    model = nq.Model.from_onnx(m)
    f = model([x])[0]
    qmodel = model.quantize([x], bit_width=8)
    q = qmodel([x])[0]
    assert np.mean(np.abs(q - f)) <= 0.1


def test_mlp_bit_sweep_tpu_mode():
    mlp = nq.onnx.load("numpy_quant_tpu/models/mlp.onnx")
    from sklearn.datasets import make_circles
    X, Y = make_circles(n_samples=400, noise=0.03, random_state=3)
    X = X.astype(np.float32)
    model = nq.Model.from_onnx(mlp)
    for bits in (4, 8, 12, 16):
        qmodel = model.quantize([X], bit_width=bits)
        acc = np.mean(qmodel([X])[0].argmax(axis=1) == Y)
        if bits >= 8:
            assert acc > 0.9, (bits, acc)
