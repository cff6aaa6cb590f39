"""ONNX serialization layer: round-trips and real-file interop."""
import os

import numpy as np
import pytest

from numpy_quant_tpu import onnx as O

REF_MLP = "/root/reference/models/mlp.onnx"


def _build_model():
    w = np.arange(12, dtype=np.float32).reshape(3, 4)
    b = np.ones(4, dtype=np.int64)
    init_w = O.from_array(w, "w")
    init_b = O.from_array(b, "b")
    inp = O.make_tensor_value_info("x", O.TensorProto.FLOAT, [2, 3])
    out = O.make_tensor_value_info("y", O.TensorProto.FLOAT, ["B", 4])
    n1 = O.make_node("MatMul", ["x", "w"], ["h"], name="mm")
    n2 = O.make_node("Gemm", ["h", "w", "b"], ["y"], name="gm",
                     alpha=1.0, transB=1, pads=[0, 1, 2, 3], mode="constant")
    g = O.make_graph([n1, n2], "g", [inp], [out], initializer=[init_w, init_b])
    return O.make_model(g, opset_imports=[O.make_opsetid("", 17)])


def test_round_trip():
    m = _build_model()
    m2 = O.load_from_string(m.SerializeToString())
    assert [n.op_type for n in m2.graph.node] == ["MatMul", "Gemm"]
    assert m2.graph.node[0].input == ["x", "w"]
    np.testing.assert_array_equal(O.to_array(m2.graph.initializer[0]),
                                  np.arange(12, dtype=np.float32).reshape(3, 4))
    assert O.to_array(m2.graph.initializer[1]).dtype == np.int64
    attrs = {a.name: O.get_attribute_value(a) for a in m2.graph.node[1].attribute}
    assert attrs["alpha"] == 1.0
    assert attrs["transB"] == 1
    assert attrs["pads"] == [0, 1, 2, 3]
    assert attrs["mode"] == b"constant"
    assert O.value_info_shape(m2.graph.input[0]) == (2, 3)
    assert O.value_info_shape(m2.graph.output[0]) == ("B", 4)
    assert [(o.domain, o.version) for o in m2.opset_import] == [("", 17)]


def test_tensor_attribute_round_trip():
    val = np.array([[1.5, -2.5]], dtype=np.float32)
    n = O.make_node("Constant", [], ["c"], name="c0", value=val)
    g = O.make_graph([n], "g", [], [O.make_tensor_value_info("c", 1, [1, 2])])
    m2 = O.load_from_string(O.make_model(g).SerializeToString())
    t = O.get_attribute_value(m2.graph.node[0].attribute[0])
    np.testing.assert_array_equal(O.to_array(t), val)


def test_save_load(tmp_path):
    m = _build_model()
    path = tmp_path / "m.onnx"
    O.save(m, path)
    m2 = O.load(path)
    assert m2.graph.name == "g"


def test_negative_ints_and_large_varints():
    t = O.from_array(np.array([-1, -(2**40), 2**40], dtype=np.int64), "t")
    n = O.make_node("Slice", ["x"], ["y"], starts=[-1, 0], ends=[-(2**31)])
    g = O.make_graph([n], "g", [], [], initializer=[t])
    m2 = O.load_from_string(O.make_model(g).SerializeToString())
    np.testing.assert_array_equal(
        O.to_array(m2.graph.initializer[0]),
        np.array([-1, -(2**40), 2**40], dtype=np.int64))
    attrs = {a.name: O.get_attribute_value(a) for a in m2.graph.node[0].attribute}
    assert attrs["starts"] == [-1, 0]
    assert attrs["ends"] == [-(2**31)]


@pytest.mark.skipif(not os.path.exists(REF_MLP), reason="reference not mounted")
def test_parse_real_torch_exported_file():
    """Parse a real torch-exported ONNX file (the reference's committed
    models/mlp.onnx, reference: models/mlp.py:77-86)."""
    m = O.load(REF_MLP)
    assert m.ir_version == 5
    assert [(o.domain, o.version) for o in m.opset_import] == [("", 10)]
    assert [n.op_type for n in m.graph.node] == ["Gemm", "Relu", "Gemm", "Sigmoid"]
    inits = {t.name: O.to_array(t) for t in m.graph.initializer}
    assert inits["fc1.weight"].shape == (5, 2)
    assert inits["fc1.weight"].dtype == np.float32
    # dynamic batch axis recorded as dim_param (reference: models/mlp.py:85-86)
    assert O.value_info_shape(m.graph.input[0]) == ("batch_size", 2)
    O.make_dim_param_fixed(m.graph, "batch_size", 7)
    assert O.value_info_shape(m.graph.input[0]) == (7, 2)
    # re-serialize and re-parse
    m2 = O.load_from_string(m.SerializeToString())
    np.testing.assert_array_equal(O.to_array(m2.graph.initializer[0]),
                                  inits[m.graph.initializer[0].name])


def test_external_data_round_trip(tmp_path):
    """save(external_data_threshold=) moves big payloads into a .data
    side file in the standard offset/length format; load() transparently
    inlines them back, and the model still executes identically."""
    import numpy_quant_tpu as nq
    from numpy_quant_tpu import onnx as O

    rng = np.random.default_rng(3)
    big = rng.normal(size=(64, 32)).astype(np.float32)
    small = rng.normal(size=(32,)).astype(np.float32)
    nodes = [O.make_node("MatMul", ["x", "w"], ["h"], name="mm"),
             O.make_node("Add", ["h", "b"], ["y"], name="add")]
    g = O.make_graph(
        nodes, "ext",
        [O.make_tensor_value_info("x", O.TensorProto.FLOAT, [4, 64])],
        [O.make_tensor_value_info("y", O.TensorProto.FLOAT, None)],
        initializer=[O.from_array(big, "w"), O.from_array(small, "b")])
    m = O.make_model(g)
    x = rng.normal(size=(4, 64)).astype(np.float32)
    want = np.asarray(nq.Model.from_onnx(m)([x])[0])

    p = str(tmp_path / "ext.onnx")
    O.save(m, p, external_data_threshold=1024)
    import os
    assert os.path.exists(p + ".data")
    assert os.path.getsize(p) < 1024          # payload left the .onnx
    assert os.path.getsize(p + ".data") == big.nbytes

    loaded = O.load(p)
    ts = {t.name: t for g2 in [loaded.graph] for t in g2.initializer}
    assert ts["w"].data_location == 0 and len(ts["w"].raw_data)
    got = np.asarray(nq.Model.from_onnx(loaded)([x])[0])
    np.testing.assert_array_equal(got, want)

    # escape attempts are rejected
    ts2 = O.load_from_string(open(p, "rb").read())
    for t in ts2.graph.initializer:
        if t.data_location == 1:
            for e in t.external_data:
                if e.key == "location":
                    e.value = "../escape.bin"
    O.save(ts2, str(tmp_path / "bad.onnx"))
    with pytest.raises(ValueError):
        O.load(str(tmp_path / "bad.onnx"))
