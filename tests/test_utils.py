"""Utility subsystems: QModel serialization (checkpoint/resume gap-fill),
profile chart, summary."""
import numpy as np

import numpy_quant_tpu as nq
from numpy_quant_tpu.utils import (
    load_qmodel,
    profile_results_plot,
    save_qmodel,
    summarize,
)

MLP = "numpy_quant_tpu/models/mlp.onnx"
RNG = np.random.default_rng(0)


def test_qmodel_save_load_roundtrip(tmp_path):
    m = nq.onnx.load(MLP)
    model = nq.Model.from_onnx(m)
    X = RNG.normal(size=(256, 2)).astype(np.float32)
    qmodel = model.quantize([X], bit_width=8)
    expected = qmodel([X])[0]

    path = tmp_path / "mlp_q.onnx"
    save_qmodel(qmodel, path, m)
    q2 = load_qmodel(path)
    assert q2.bit_width == 8
    assert set(q2.quant_params) == set(qmodel.quant_params)
    actual = q2([X])[0]
    np.testing.assert_array_equal(actual, expected)


def test_qmodel_save_load_subbyte(tmp_path):
    m = nq.onnx.load(MLP)
    model = nq.Model.from_onnx(m)
    X = RNG.normal(size=(128, 2)).astype(np.float32)
    qmodel = model.quantize([X], bit_width=4)
    expected = qmodel([X])[0]
    path = tmp_path / "mlp_q4.onnx"
    save_qmodel(qmodel, path, m)
    actual = load_qmodel(path)([X])[0]
    np.testing.assert_array_equal(actual, expected)


def test_profile_plot_renders():
    out = profile_results_plot({"Gemm": 0.5, "Relu": 0.1},
                               {"Gemm": 0.2, "TinyqQuant": 0.05}, show=3)
    assert "Gemm" in out and "quantized" in out


def test_summary_headers():
    m = nq.onnx.load(MLP)
    model = nq.Model.from_onnx(m)
    s = summarize(model)
    assert s.splitlines()[1].split("|")[0].strip() == "Node"


def test_calibration_modes_agree():
    m = nq.onnx.load(MLP)
    model = nq.Model.from_onnx(m)
    X = RNG.normal(size=(64, 2)).astype(np.float32)
    jit_stats = model.calibration_stats([X], mode="jit")
    eager_stats = model.calibration_stats([X], mode="eager")
    assert set(jit_stats) == set(eager_stats)
    for k in jit_stats:
        np.testing.assert_allclose(jit_stats[k], eager_stats[k], atol=1e-6,
                                   err_msg=k)


def test_qmodel_save_load_quantize_conv(tmp_path):
    from numpy_quant_tpu.models import testgen
    m = testgen.conv(b=2, c=3, inp_shape=(9, 10), out_c=2,
                     kernel_shape=(3, 2), pads=(0, 2, 2, 1), strides=(2, 1),
                     random_seed=0)
    model = nq.Model.from_onnx(m)
    x = RNG.normal(size=(2, 3, 9, 10)).astype(np.float32)
    qmodel = model.quantize([x], bit_width=8, quantize_conv=True)
    expected = qmodel([x])[0]
    path = tmp_path / "conv_q.onnx"
    save_qmodel(qmodel, path, m)
    q2 = load_qmodel(path)
    assert "Conv" in q2.quantized_ops
    np.testing.assert_array_equal(q2([x])[0], expected)
