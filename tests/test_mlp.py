"""MLP end-to-end: import, summary, float/quantized inference, bit-width
sweep. Mirrors reference: test/test_mlp.py, with the reference itself
(run through our onnx shim) as the parity oracle instead of onnxruntime.
"""
import pathlib
import textwrap

import numpy as np
import pytest

import numpy_quant_tpu as nq
from numpy_quant_tpu.utils import summarize

from .oracle import onnx_shim, requires_reference

MLP_PATH = pathlib.Path(__file__).parent.parent / "numpy_quant_tpu" / "models" / "mlp.onnx"

EXPECTED_SUMMARY = textwrap.dedent("""\
    =================+=====================+====================
    Node             | Inputs              | Outputs
    =================+=====================+====================
    /fc1/Gemm        | input               | /fc1/Gemm_output_0
                     | fc1.weight          |
                     | fc1.bias            |
    -----------------+---------------------+--------------------
    /relu/Relu       | /fc1/Gemm_output_0  | /relu/Relu_output_0
    -----------------+---------------------+--------------------
    /fc2/Gemm        | /relu/Relu_output_0 | /fc2/Gemm_output_0
                     | fc2.weight          |
                     | fc2.bias            |
    -----------------+---------------------+--------------------
    /sigmoid/Sigmoid | /fc2/Gemm_output_0  | output
    -----------------+---------------------+--------------------
    """)


@pytest.fixture(scope="module")
def mlp_onnx():
    return nq.onnx.load(MLP_PATH)


@pytest.fixture(scope="module")
def circles():
    from sklearn.datasets import make_circles
    X, Y = make_circles(n_samples=1000, noise=0.03, random_state=3)
    return X.astype(np.float32), Y


def _norm(s: str) -> str:
    return "\n".join(line.rstrip() for line in s.splitlines())


def test_mlp_onnx_import(mlp_onnx):
    # reference: test/test_mlp.py:82-103 (trailing spaces normalized)
    model = nq.Model.from_onnx(mlp_onnx)
    assert _norm(summarize(model)) == _norm(EXPECTED_SUMMARY)


def test_mlp_float_inference(mlp_onnx, circles):
    # reference: test/test_mlp.py:105-125 (torch closed-form as oracle)
    X, Y = circles
    model = nq.Model.from_onnx(mlp_onnx)
    outputs = model([X])[0]
    acc = np.mean(outputs.argmax(axis=1) == Y)
    assert acc > 0.9

    inits = {t.name: nq.onnx.to_array(t) for t in mlp_onnx.graph.initializer}
    h = np.maximum(X @ inits["fc1.weight"].T + inits["fc1.bias"], 0.0)
    logits = h @ inits["fc2.weight"].T + inits["fc2.bias"]
    desired = 1.0 / (1.0 + np.exp(-logits))
    np.testing.assert_allclose(outputs, desired, rtol=1e-3, atol=1e-6)


def test_mlp_quantization_summary(mlp_onnx, circles):
    # reference: test/test_mlp.py:127-149
    X, _ = circles
    model = nq.Model.from_onnx(mlp_onnx)
    qmodel = model.quantize([X])
    assert qmodel.bit_width == 8
    assert _norm(summarize(qmodel)) == _norm(EXPECTED_SUMMARY)


def test_mlp_quantized_inference(mlp_onnx, circles):
    # reference: test/test_mlp.py:151-175
    X, Y = circles
    model = nq.Model.from_onnx(mlp_onnx)
    qmodel = model.quantize([X], bit_width=8)

    outputs = model([X])[0]
    qoutputs = qmodel([X])[0]

    acc = np.mean(outputs.argmax(axis=1) == Y)
    qacc = np.mean(qoutputs.argmax(axis=1) == Y)
    assert qacc >= acc - 0.02

    # per-value dequantization error, as printed by the reference test
    model([X], record=True)
    qmodel([X], record=True)
    qvalue_dict = {v.name: v for v in qmodel.values}
    for value in model.values:
        x = value.data
        qx = qvalue_dict[value.name].data
        denom = float(np.asarray(x.data).max() - np.asarray(x.data).min())
        if denom == 0.0:
            continue
        if isinstance(qx, nq.QTensor):
            diff = np.mean(np.abs(np.asarray(qx.dequantize().data) - np.asarray(x.data)))
        else:
            diff = np.mean(np.abs(np.asarray(qx.data) - np.asarray(x.data)))
        assert diff / denom < 0.05, value.name


@pytest.mark.parametrize("bit_width", list(range(1, 17)))
def test_differing_bit_widths(mlp_onnx, circles, bit_width):
    # reference: test/test_mlp.py:177-186
    X, Y = circles
    model = nq.Model.from_onnx(mlp_onnx)
    qmodel = model.quantize([X], bit_width=bit_width)
    qoutputs = qmodel([X])[0]
    qacc = np.mean(qoutputs.argmax(axis=1) == Y)
    if bit_width >= 6:
        assert qacc > 0.9, f"bit_width={bit_width}: acc={qacc}"


@requires_reference
def test_mlp_reference_parity(mlp_onnx, circles):
    """Full-pipeline parity vs the reference running on our ONNX objects.

    Float path and calibration stats agree to f32 rounding; with
    identical quantization parameters injected, the integer path is
    BIT-EXACT per intermediate tensor (BASELINE.md build target).
    """
    X, _ = circles
    ref_model_mod = onnx_shim()

    model = nq.Model.from_onnx(mlp_onnx)
    ref_model = ref_model_mod.Model.from_onnx(mlp_onnx)

    ours = model([X])[0]
    refs = ref_model([X])[0]
    np.testing.assert_allclose(ours, refs, atol=1e-6)

    qmodel = model.quantize([X], bit_width=8)
    ref_qmodel = ref_model.quantize([X], bit_width=8)

    # calibration-derived qparams agree to 1 ulp of f32
    for name, ref_qp in ref_qmodel.quant_params.items():
        our_qp = qmodel.quant_params[name]
        np.testing.assert_allclose(np.float32(our_qp.scale),
                                   np.float32(ref_qp.scale), rtol=3e-7)
        assert (our_qp.zero_point is None) == (ref_qp.zero_point is None)

    # inject identical qparams -> integer path must be bit-exact
    qmodel.quant_params = {
        name: nq.QuantizationParams(np.float32(qp.scale), qp.zero_point)
        for name, qp in ref_qmodel.quant_params.items()}
    qmodel._jit_cache.clear()
    # re-quantize constants from the original float data with the
    # injected params (checks our quantize kernel on real weights)
    ref_qvalues = {v.name: v for v in ref_qmodel.values}
    orig_values = {v.name: v for v in model.values}
    for v in qmodel.values:
        if isinstance(v, nq.Constant):
            ref_qt = ref_qvalues[v.name].data
            v.data = nq.quantize_tensor(orig_values[v.name].data,
                                        ref_qt.bit_width,
                                        np.float32(ref_qt.scale),
                                        ref_qt.zero_point)
            np.testing.assert_array_equal(np.asarray(v.data.data),
                                          ref_qt.data, err_msg=v.name)

    qmodel([X], record=True)
    ref_qmodel([X])
    our_vals = {v.name: v for v in qmodel.values}
    for ref_v in ref_qmodel.values:
        our_v = our_vals[ref_v.name]
        if our_v.data is None or ref_v.data is None:
            continue
        ours_d = np.asarray(our_v.data.data)
        refs_d = np.asarray(ref_v.data.data)
        if isinstance(our_v.data, nq.QTensor):
            np.testing.assert_array_equal(ours_d, refs_d, err_msg=ref_v.name)
        else:
            np.testing.assert_allclose(ours_d, refs_d, atol=1e-6,
                                       err_msg=ref_v.name)


def test_memory_teardown(mlp_onnx, circles):
    """Repeated quantize loops must not accumulate memory
    (reference: test/long_running/test_delete.py:14-22)."""
    X, _ = circles
    model = nq.Model.from_onnx(mlp_onnx)
    for _ in range(30):
        qmodel = model.quantize([X[:64]], bit_width=8)
        del qmodel


@requires_reference
def test_summary_exact_string_parity(mlp_onnx):
    """Our summarize output is byte-identical to the reference's
    (reference: extra/model_summary.py, including trailing spaces)."""
    import sys
    onnx_shim()
    sys.path.insert(0, "/root/reference")
    from extra.model_summary import summarize as ref_summarize

    ref_model_mod = onnx_shim()
    ours = summarize(nq.Model.from_onnx(mlp_onnx))
    theirs = ref_summarize(ref_model_mod.Model.from_onnx(mlp_onnx))
    assert ours == theirs
