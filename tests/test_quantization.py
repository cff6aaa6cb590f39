"""Quant math core: bit-exact parity vs the reference oracle, plus the
reference's own self-consistency checks
(reference: test/test_quantization.py:24-149)."""
import itertools

import numpy as np
import pytest

from numpy_quant_tpu import quantization as Q
from numpy_quant_tpu.tensor import (
    FTensor,
    quantize_tensor,
    quantize_tensor_min_max,
    tensor_min_max,
)

from .oracle import ref_quantization, requires_reference

RNG = np.random.default_rng(0)

BIT_WIDTHS = [1, 2, 3, 4, 5, 7, 8, 12, 16]


def _minmax(x):
    return (np.minimum(x.min(), np.float32(0.0)),
            np.maximum(x.max(), np.float32(0.0)))


@requires_reference
@pytest.mark.parametrize("bit_width", BIT_WIDTHS)
@pytest.mark.parametrize("asymmetric", [False, True])
def test_quant_parameters_parity(bit_width, asymmetric):
    ref = ref_quantization()
    for _ in range(5):
        x = ((RNG.random(512).astype(np.float32) - RNG.random()) * 11).astype(np.float32)
        mn, mx = _minmax(x)
        s_ref, z_ref = ref.quant_parameters(mn, mx, bit_width, asymmetric)
        s_our, z_our = Q.quant_parameters(mn, mx, bit_width, asymmetric)
        assert s_ref == s_our
        assert (z_ref is None) == (z_our is None)
        if z_ref is not None:
            assert int(z_ref) == int(z_our)


@requires_reference
@pytest.mark.parametrize("bit_width", BIT_WIDTHS)
@pytest.mark.parametrize("asymmetric", [False, True])
def test_quantize_dequantize_parity(bit_width, asymmetric):
    ref = ref_quantization()
    x = ((RNG.random(2048).astype(np.float32) - 0.4) * 9).astype(np.float32)
    mn, mx = _minmax(x)
    scale, zp = ref.quant_parameters(mn, mx, bit_width, asymmetric)
    q_ref = ref.quantize(x, bit_width, scale, zp)
    q_our = np.asarray(Q.quantize(x, bit_width, scale, zp))
    np.testing.assert_array_equal(q_ref, q_our)
    d_ref = ref.dequantize(q_ref, scale, zp)
    d_our = np.asarray(Q.dequantize(q_our, scale, zp))
    assert d_our.dtype == np.float32
    np.testing.assert_array_equal(d_ref, d_our)


@requires_reference
@pytest.mark.parametrize("bit_width", [2, 4, 8, 12, 16])
@pytest.mark.parametrize("w_asym,x_asym", list(itertools.product([False, True], repeat=2)))
def test_q_matmul_parity(bit_width, w_asym, x_asym):
    ref = ref_quantization()
    w = ((RNG.random((2, 1, 4, 3)).astype(np.float32) - 0.5) * 4)
    x = (RNG.random((1, 2, 3, 4)).astype(np.float32) * 2)

    def qp(d, asym):
        return ref.quant_parameters(*_minmax(d), bit_width, asym)

    sw, zw = qp(w, w_asym)
    sx, zx = qp(x, x_asym)
    qw = ref.quantize(w, bit_width, sw, zw)
    qx = ref.quantize(x, bit_width, sx, zx)

    mm_ref, s_ref, zp_ref = ref.q_matmul(qw, sw, zw, qx, sx, zx)
    mm_our, s_our, zp_our = Q.q_matmul(qw, sw, zw, qx, sx, zx, bit_width=bit_width)
    np.testing.assert_array_equal(mm_ref, np.asarray(mm_our))
    assert s_ref == s_our
    if zp_ref is None:
        assert zp_our is None
    else:
        np.testing.assert_array_equal(zp_ref, np.asarray(zp_our))

    # requantize the accumulator to asymmetric 8-bit output params
    y = np.matmul(w, x)
    ys, yz = ref.quant_parameters(*_minmax(y), bit_width, True)
    rq_ref = ref.requantize(mm_ref, s_ref, zp_ref, ys, yz, bit_width)
    rq_our = np.asarray(Q.requantize(mm_our, s_our, zp_our, ys, yz, bit_width))
    np.testing.assert_array_equal(rq_ref, rq_our)


def test_quantize_tensor_roundtrip():
    # reference: test/test_quantization.py:24-38
    x_data = np.array([4.2, 2.1, 4.0], dtype=np.float32).T
    x = FTensor(x_data)
    qx_symmetric = quantize_tensor_min_max(x, bit_width=8, asymmetric=False)
    qx_asymmetric = quantize_tensor_min_max(x, bit_width=8, asymmetric=True)
    np.testing.assert_allclose(np.asarray(qx_symmetric.dequantize().data),
                               x_data, rtol=1e-1)
    np.testing.assert_allclose(np.asarray(qx_asymmetric.dequantize().data),
                               x_data, rtol=1e-1)


@pytest.mark.parametrize("w_asym,x_asym", list(itertools.product([False, True], repeat=2)))
def test_quantized_matmul_accuracy(w_asym, x_asym):
    # reference: test/test_quantization.py:40-86
    w_data = np.array([[+1.3, +5.0, -0.3],
                       [+2.1, -3.4, -0.1],
                       [-0.4, +4.0, +1.7]], dtype=np.float32)
    x_data = np.array([[2.2], [2.1], [-2.0]], dtype=np.float32)
    qw = quantize_tensor_min_max(FTensor(w_data), bit_width=8, asymmetric=w_asym)
    qx = quantize_tensor_min_max(FTensor(x_data), bit_width=8, asymmetric=x_asym)
    y = qw.matmul(qx)
    assert y.bit_width == 32
    np.testing.assert_allclose(np.asarray(y.dequantize().data),
                               np.matmul(w_data, x_data), rtol=0.5)

    w_data = RNG.random((2, 1, 4, 3)).astype(np.float32)
    x_data = RNG.random((1, 2, 3, 4)).astype(np.float32)
    qw = quantize_tensor_min_max(FTensor(w_data), bit_width=8, asymmetric=w_asym)
    qx = quantize_tensor_min_max(FTensor(x_data), bit_width=8, asymmetric=x_asym)
    y = qw.matmul(qx)
    np.testing.assert_allclose(np.asarray(y.dequantize().data),
                               np.matmul(w_data, x_data), rtol=0.5)


@pytest.mark.parametrize("w_asym,x_asym", list(itertools.product([False, True], repeat=2)))
def test_quantized_matmul_with_requantize(w_asym, x_asym):
    # reference: test/test_quantization.py:88-149
    w_data = RNG.random((2, 1, 4, 3)).astype(np.float32)
    x_data = RNG.random((1, 2, 3, 4)).astype(np.float32)
    w, x = FTensor(w_data), FTensor(x_data)
    y = w.matmul(x)

    qw = quantize_tensor_min_max(w, bit_width=8, asymmetric=w_asym)
    qx = quantize_tensor_min_max(x, bit_width=8, asymmetric=x_asym)
    y_scale, y_zero_point = Q.quant_parameters(*tensor_min_max(y), 8, True)
    qy = quantize_tensor(y, bit_width=8, scale=y_scale, zero_point=y_zero_point)

    out = qw.matmul(qx).requantize(8, y_scale, y_zero_point)
    np.testing.assert_allclose(np.asarray(out.data), np.asarray(qy.data), rtol=2)


def test_symmetric_scale_positive_max_quirk():
    """Symmetric scale keys off the positive max even when |min| is larger
    (SURVEY.md §5.1; reference: numpy_quant/numpy_quantization.py:15)."""
    scale, zp = Q.quant_parameters(np.float32(-8.0), np.float32(2.0), 8, False)
    assert zp is None
    np.testing.assert_allclose(scale, np.float32(2 * 2.0 / 255.0))


def test_rounding_half_to_even():
    x = np.array([0.5, 1.5, 2.5, -0.5, -1.5], dtype=np.float32)
    q = np.asarray(Q.quantize(x, 8, np.float32(1.0), None))
    np.testing.assert_array_equal(q, [0, 2, 2, 0, -2])


def test_per_channel_scales_roundtrip():
    """Per-channel weight quantization (parity-plus, BASELINE.md config
    #4): per-channel roundtrip error is bounded by scale/2 per channel,
    including all-negative channels (which the reference's positive-max
    symmetric quirk would map to scale 0)."""
    w = RNG.normal(size=(6, 16)).astype(np.float32)
    w[3] = -np.abs(w[3])  # all-negative channel
    scale = Q.per_channel_scales(w, 8, axis=0)
    assert scale.shape == (6, 1)
    assert np.all(scale > 0)
    q = np.asarray(Q.quantize(w, 8, scale, None))
    deq = np.asarray(Q.dequantize(q, scale, None))
    assert np.all(np.abs(deq - w) <= scale / 2 + 1e-7)


def test_per_channel_quantize_model():
    import numpy_quant_tpu as nq
    mlp = nq.onnx.load("numpy_quant_tpu/models/mlp.onnx")
    X = RNG.normal(size=(256, 2)).astype(np.float32)
    model = nq.Model.from_onnx(mlp)
    f = model([X])[0]
    qc = model.quantize([X], bit_width=8, per_channel_weights=True)
    qconsts = {v.name: v.data for v in qc.values
               if hasattr(v.data, "scale") and v.data is not None}
    # weights got vector scales; biases/activations stay scalar
    assert np.asarray(qconsts["fc1.weight"].scale).shape == (5, 1)
    out = qc([X])[0]
    denom = f.max() - f.min()
    assert np.mean(np.abs(out - f)) / denom < 0.02


def test_gemm_alpha_beta_quantized_path():
    """Quantized Gemm honours alpha/beta (the reference ignores them,
    model.py:122-131): alpha folds into the accumulator scale at
    runtime, beta into the bias quantization scale at quantize() time."""
    import numpy_quant_tpu as nq
    from numpy_quant_tpu.models import testgen

    m = testgen.gemm(k=32, m=16, n=8, random_seed=0, alpha=0.5, beta=2.0)
    model = nq.Model.from_onnx(m)
    X = RNG.normal(size=(32, 16)).astype(np.float32)
    f = model([X])[0]

    # float path is spec-correct
    rng2 = np.random.default_rng(0)
    w = rng2.normal(size=(16, 8)).astype(np.float32)
    b = rng2.normal(size=8).astype(np.float32)
    np.testing.assert_allclose(f, 0.5 * (X @ w) + 2.0 * b, rtol=1e-4,
                               atol=1e-5)

    # int path runs (round 1 raised TypeError) and tracks the float path
    qmodel = model.quantize([X], bit_width=8)
    out = qmodel([X])[0]
    denom = f.max() - f.min()
    assert np.mean(np.abs(out - f)) / denom < 0.05


def test_gemm_beta_zero_quantized_path():
    import numpy_quant_tpu as nq
    from numpy_quant_tpu.models import testgen

    m = testgen.gemm(k=16, m=8, n=4, random_seed=1, beta=0.0)
    model = nq.Model.from_onnx(m)
    X = RNG.normal(size=(16, 8)).astype(np.float32)
    f = model([X])[0]
    rng2 = np.random.default_rng(1)
    w = rng2.normal(size=(8, 4)).astype(np.float32)
    np.testing.assert_allclose(f, X @ w, rtol=1e-4, atol=1e-5)
    qmodel = model.quantize([X], bit_width=8)
    out = qmodel([X])[0]
    denom = f.max() - f.min()
    assert np.mean(np.abs(out - f)) / denom < 0.05


def test_percentile_calibration_clips_outliers():
    """percentile= calibration (parity-plus: the reference knows only
    min/max) clips activation ranges to the requested quantiles while
    weights keep exact min/max; at low bit widths the outlier-robust
    scale cuts quantization error on the bulk of the data."""
    import numpy_quant_tpu as nq
    from numpy_quant_tpu import onnx as O
    from numpy_quant_tpu.graph import Constant

    rng = np.random.default_rng(0)
    w = rng.normal(size=(16, 16)).astype(np.float32) * 0.1
    x = rng.normal(size=(256, 16)).astype(np.float32)
    x[0, 0] = 80.0  # one huge activation outlier
    inp = O.make_tensor_value_info("x", O.TensorProto.FLOAT, [256, 16])
    out = O.make_tensor_value_info("y", O.TensorProto.FLOAT, None)
    node = O.make_node("MatMul", ["x", "w"], ["y"], name="mm")
    g = O.make_graph([node], "g", [inp], [out],
                     initializer=[O.from_array(w, "w")])
    model = nq.Model.from_onnx(O.make_model(g))

    stats_mm = model.calibration_stats([x])
    stats_p = model.calibration_stats([x], percentile=99.5)
    # activation range shrinks to the quantile; the weight Constant's
    # range is untouched
    assert stats_p["x"][1] < 5.0 < stats_mm["x"][1]
    np.testing.assert_allclose(stats_p["w"], stats_mm["w"], rtol=1e-6)
    lo, hi = np.quantile(x, [0.005, 0.995])
    np.testing.assert_allclose(stats_p["x"], (lo, hi), atol=1e-2)

    f = model([x])[0]
    q_minmax = model.quantize([x], bit_width=4)
    q_pct = model.quantize([x], bit_width=4, percentile=99.5)
    mask = np.ones(256, bool)
    mask[0] = False  # error on the bulk, not the outlier row
    err_mm = np.abs(q_minmax([x])[0] - f)[mask].mean()
    err_p = np.abs(q_pct([x])[0] - f)[mask].mean()
    assert err_p < err_mm * 0.5, (err_p, err_mm)
