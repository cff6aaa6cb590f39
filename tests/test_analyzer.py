"""utils.quantization_report: per-value SQNR between the float and
quantized executors -- the tool that says WHERE precision is lost.
"""
import numpy as np

import numpy_quant_tpu as nq
from numpy_quant_tpu import onnx as O

RNG = np.random.default_rng(59)


def test_quantization_report_ranks_the_bad_layer_worst():
    """Two parallel branches off one input: branch B's weight is
    quantized at 2 bits (per-weight mixed precision), branch A at 8.
    The report must rank B's output far below A's."""
    wa = RNG.normal(size=(8, 8)).astype(np.float32)
    wb = RNG.normal(size=(8, 8)).astype(np.float32)
    nodes = [
        O.make_node("MatMul", ["x", "wa"], ["ya"], name="a"),
        O.make_node("MatMul", ["x", "wb"], ["yb"], name="b"),
    ]
    g = O.make_graph(
        nodes, "rep",
        [O.make_tensor_value_info("x", O.TensorProto.FLOAT, [32, 8])],
        [O.make_tensor_value_info("ya", O.TensorProto.FLOAT, None),
         O.make_tensor_value_info("yb", O.TensorProto.FLOAT, None)],
        initializer=[O.from_array(wa, "wa"), O.from_array(wb, "wb")])
    model = nq.Model.from_onnx(O.make_model(g))
    x = RNG.normal(size=(32, 8)).astype(np.float32)
    q = model.quantize([x], bit_width=8, weight_bit_width={"wb": 2})

    from numpy_quant_tpu.utils import quantization_report
    rows = quantization_report(model, q, [x])
    by_name = {r[0]: r for r in rows}
    assert "ya" in by_name and "yb" in by_name
    assert by_name["yb"][1] < by_name["ya"][1] - 10  # >10 dB worse
    assert by_name["yb"][3] == "MatMul"
    # worst-first ordering
    sqnrs = [r[1] for r in rows]
    assert sqnrs == sorted(sqnrs)


def test_print_report_runs(capsys):
    from numpy_quant_tpu.utils import print_quantization_report

    mlp = nq.onnx.load("numpy_quant_tpu/models/mlp.onnx")
    model = nq.Model.from_onnx(mlp)
    x = RNG.normal(size=(32, 2)).astype(np.float32)
    q = model.quantize([x], bit_width=8)
    print_quantization_report(model, q, [x], top=5)
    out = capsys.readouterr().out
    assert "SQNR dB" in out and len(out.splitlines()) >= 2
