"""Float-path graph inference vs closed-form/torch oracles.

Mirrors reference: test/test_inference.py with torch replacing
onnxruntime as ground truth (no onnxruntime in this environment).
"""
import numpy as np
import pytest

from numpy_quant_tpu import onnx as O
from numpy_quant_tpu.model import Model
from numpy_quant_tpu.models import testgen

RNG = np.random.default_rng(0)


def test_gemm():
    # reference: test/test_inference.py:17-33
    k, m, n = 3, 4, 2
    onnx_model = testgen.gemm(k, m, n, random_seed=0)
    inits = {t.name: O.to_array(t) for t in onnx_model.graph.initializer}
    model = Model.from_onnx(onnx_model)
    input_data = RNG.normal(size=(k, m)).astype(np.float32)
    actual = model([input_data])[0]
    desired = input_data.dot(inits["weight"]) + inits["bias"]
    np.testing.assert_allclose(actual, desired, atol=1e-6)


def test_gemm_trans():
    w = RNG.normal(size=(4, 3)).astype(np.float32)
    b = RNG.normal(size=4).astype(np.float32)
    inp = O.make_tensor_value_info("x", O.TensorProto.FLOAT, [2, 3])
    out = O.make_tensor_value_info("y", O.TensorProto.FLOAT, [2, 4])
    node = O.make_node("Gemm", ["x", "w", "b"], ["y"], name="g", transB=1)
    g = O.make_graph([node], "g", [inp], [out],
                     initializer=[O.from_array(w, "w"), O.from_array(b, "b")])
    model = Model.from_onnx(O.make_model(g))
    x = RNG.normal(size=(2, 3)).astype(np.float32)
    np.testing.assert_allclose(model([x])[0], x @ w.T + b, atol=1e-6)


def test_matmul_broadcast_batched():
    # reference: test/test_inference.py:35-50
    a_shape, b_shape = (2, 1, 4, 3), (1, 3, 3, 5)
    onnx_model = testgen.matmul(a_shape, b_shape)
    model = Model.from_onnx(onnx_model)
    a = RNG.normal(size=a_shape).astype(np.float32)
    b = RNG.normal(size=b_shape).astype(np.float32)
    actual = model([a, b])[0]
    np.testing.assert_allclose(actual, np.matmul(a, b), atol=1e-5)


def test_conv_model():
    # reference: test/test_inference.py:52-83 (torch as oracle)
    torch = pytest.importorskip("torch")
    b, c, inp_shape = 2, 3, (9, 10)
    pads, strides = (0, 2, 2, 1), (2, 1)
    onnx_model = testgen.conv(b=b, c=c, inp_shape=inp_shape, out_c=2,
                              kernel_shape=(3, 2), pads=pads, strides=strides,
                              random_seed=0)
    inits = {t.name: O.to_array(t) for t in onnx_model.graph.initializer}
    model = Model.from_onnx(onnx_model)
    x = RNG.normal(size=(b, c, *inp_shape)).astype(np.float32)
    actual = model([x])[0]

    tx = torch.nn.functional.pad(torch.tensor(x),
                                 (pads[1], pads[3], pads[0], pads[2]))
    desired = torch.nn.functional.conv2d(
        tx, torch.tensor(inits["weight"]), torch.tensor(inits["bias"]),
        stride=strides).numpy()
    np.testing.assert_allclose(actual, desired, atol=1e-4)


def test_expand_runtime_shape_input():
    """Runtime int64 shape inputs become static jit arguments.
    reference: test/test_inference.py:85-101."""
    onnx_model = testgen.expand()
    model = Model.from_onnx(onnx_model)
    x = np.ones((1, 1, 8), dtype=np.float32)

    out = model([x, np.array([1, 1, 1], dtype=np.int64)])[0]
    np.testing.assert_array_equal(out, x)

    out = model([x, np.array([2, 3, 1], dtype=np.int64)])[0]
    assert out.shape == (2, 3, 8)
    np.testing.assert_array_equal(out, np.broadcast_to(x, (2, 3, 8)))


def test_shape_gather_unsqueeze_concat_reshape_chain():
    """The torch-exporter shape-computation pattern constant-folds at
    trace time (SURVEY.md §7: trace-time partial evaluation)."""
    inp = O.make_tensor_value_info("x", O.TensorProto.FLOAT, [2, 3, 4])
    out = O.make_tensor_value_info("y", O.TensorProto.FLOAT, [2, 12])
    nodes = [
        O.make_node("Shape", ["x"], ["s"], name="shape"),
        O.make_node("Constant", [], ["i0"], name="c0",
                    value=np.array(0, dtype=np.int64)),
        O.make_node("Gather", ["s", "i0"], ["d0"], name="gather", axis=0),
        O.make_node("Unsqueeze", ["d0", "ax0"], ["d0u"], name="unsq"),
        O.make_node("Constant", [], ["m1"], name="c1",
                    value=np.array([-1], dtype=np.int64)),
        O.make_node("Concat", ["d0u", "m1"], ["newshape"], name="cat", axis=0),
        O.make_node("Reshape", ["x", "newshape"], ["y"], name="reshape"),
    ]
    g = O.make_graph(nodes, "g", [inp], [out],
                     initializer=[O.from_array(np.array([0], dtype=np.int64), "ax0")])
    model = Model.from_onnx(O.make_model(g))
    x = RNG.normal(size=(2, 3, 4)).astype(np.float32)
    np.testing.assert_array_equal(model([x])[0], x.reshape(2, 12))


def test_where_equal_constantofshape():
    """Equal/Where/ConstantOfShape on the shape domain (the torch Expand
    lowering pattern for ViT cls-token broadcast)."""
    inp = O.make_tensor_value_info("x", O.TensorProto.FLOAT, [1, 1, 8])
    out = O.make_tensor_value_info("y", O.TensorProto.FLOAT, [4, 1, 8])
    nodes = [
        O.make_node("Constant", [], ["target"], name="c0",
                    value=np.array([4, -1, -1], dtype=np.int64)),
        O.make_node("Constant", [], ["minus1"], name="c1",
                    value=np.array([-1], dtype=np.int64)),
        O.make_node("Equal", ["target", "minus1"], ["mask"], name="eq"),
        O.make_node("Shape", ["x"], ["xs"], name="shape"),
        O.make_node("Where", ["mask", "xs", "target"], ["resolved"], name="wh"),
        O.make_node("Expand", ["x", "resolved"], ["y"], name="ex"),
    ]
    g = O.make_graph(nodes, "g", [inp], [out])
    model = Model.from_onnx(O.make_model(g))
    x = RNG.normal(size=(1, 1, 8)).astype(np.float32)
    np.testing.assert_array_equal(model([x])[0], np.broadcast_to(x, (4, 1, 8)))


def test_slice_with_steps():
    inp = O.make_tensor_value_info("x", O.TensorProto.FLOAT, [4, 6])
    out = O.make_tensor_value_info("y", O.TensorProto.FLOAT, [4, 2])
    g = O.make_graph(
        [O.make_node("Slice", ["x", "st", "en", "ax", "sp"], ["y"], name="sl")],
        "g", [inp], [out],
        initializer=[O.from_array(np.array([1], dtype=np.int64), "st"),
                     O.from_array(np.array([5], dtype=np.int64), "en"),
                     O.from_array(np.array([1], dtype=np.int64), "ax"),
                     O.from_array(np.array([2], dtype=np.int64), "sp")])
    model = Model.from_onnx(O.make_model(g))
    x = RNG.normal(size=(4, 6)).astype(np.float32)
    np.testing.assert_array_equal(model([x])[0], x[:, 1:5:2])


def test_layernorm_softmax_erf_ops():
    torch = pytest.importorskip("torch")
    inp = O.make_tensor_value_info("x", O.TensorProto.FLOAT, [2, 5, 8])
    outs = [O.make_tensor_value_info(n, O.TensorProto.FLOAT, [2, 5, 8])
            for n in ("ln", "sm", "er", "th")]
    scale = RNG.normal(size=8).astype(np.float32)
    bias = RNG.normal(size=8).astype(np.float32)
    nodes = [
        O.make_node("LayerNormalization", ["x", "scale", "bias"], ["ln"],
                    name="ln", axis=-1, epsilon=1e-5),
        O.make_node("Softmax", ["x"], ["sm"], name="sm", axis=-1),
        O.make_node("Erf", ["x"], ["er"], name="er"),
        O.make_node("Tanh", ["x"], ["th"], name="th"),
    ]
    g = O.make_graph(nodes, "g", [inp], outs,
                     initializer=[O.from_array(scale, "scale"),
                                  O.from_array(bias, "bias")])
    model = Model.from_onnx(O.make_model(g))
    x = RNG.normal(size=(2, 5, 8)).astype(np.float32)
    ln, sm, er, th = model([x])
    tx = torch.tensor(x)
    np.testing.assert_allclose(
        ln, torch.nn.functional.layer_norm(
            tx, (8,), torch.tensor(scale), torch.tensor(bias)).numpy(),
        atol=1e-5)
    np.testing.assert_allclose(
        sm, torch.softmax(tx, dim=-1).numpy(), atol=1e-6)
    # A&S 7.1.26 polynomial approximation error is ~1.5e-7 (SURVEY.md §2 #12)
    np.testing.assert_allclose(er, torch.erf(tx).numpy(), atol=5e-7)
    np.testing.assert_allclose(th, torch.tanh(tx).numpy(), atol=1e-6)


def test_profile_mode_matches_jit_mode():
    onnx_model = testgen.gemm(3, 4, 2, random_seed=0)
    model = Model.from_onnx(onnx_model)
    x = RNG.normal(size=(3, 4)).astype(np.float32)
    fast = model([x])[0]
    eager, prof = model([x], profile=True)
    np.testing.assert_array_equal(fast, eager[0])
    assert set(prof.keys()) == {"Gemm"}
    assert prof["Gemm"] >= 0.0


def test_record_mode_populates_values():
    onnx_model = testgen.gemm(3, 4, 2, random_seed=0)
    model = Model.from_onnx(onnx_model)
    x = RNG.normal(size=(3, 4)).astype(np.float32)
    model([x], record=True)
    by_name = {v.name: v for v in model.values}
    assert by_name["output"].data is not None
    np.testing.assert_array_equal(np.asarray(by_name["input"].data.data), x)


def test_map_batches_matches_per_call():
    """map_batches (one scanned device program over a steps axis)
    returns exactly what per-batch __call__ returns, float and
    quantized."""
    import numpy_quant_tpu as nq

    mlp = nq.onnx.load("numpy_quant_tpu/models/mlp.onnx")
    model = Model.from_onnx(mlp)
    xs = RNG.normal(size=(5, 16, 2)).astype(np.float32)
    got = model.map_batches([xs])[0]
    assert got.shape[0] == 5
    for s in range(5):
        np.testing.assert_allclose(got[s], model([xs[s]])[0], atol=1e-6)

    q = model.quantize([xs.reshape(-1, 2)], bit_width=8)
    qgot = q.map_batches([xs])[0]
    for s in range(5):
        np.testing.assert_array_equal(qgot[s], q([xs[s]])[0])


@pytest.mark.parametrize("depth", [1, 3, 10])
def test_serve_stream_matches_per_call(depth):
    """serve_stream (pipelined online serving: up to ``depth`` forwards
    in flight) yields, in order, exactly what blocking per-batch
    __call__ returns -- float and quantized, any pipeline depth
    (deeper than the request count included)."""
    import numpy_quant_tpu as nq

    mlp = nq.onnx.load("numpy_quant_tpu/models/mlp.onnx")
    model = Model.from_onnx(mlp)
    xs = RNG.normal(size=(6, 16, 2)).astype(np.float32)
    seq = [model([x])[0] for x in xs]
    got = list(model.serve_stream(([x] for x in xs), depth=depth))
    assert len(got) == len(seq)
    for g, s in zip(got, seq):
        np.testing.assert_array_equal(g[0], s)

    q = model.quantize([xs.reshape(-1, 2)], bit_width=8)
    qseq = [q([x])[0] for x in xs]
    qgot = list(q.serve_stream(([x] for x in xs), depth=depth))
    for g, s in zip(qgot, qseq):
        np.testing.assert_array_equal(g[0], s)


def test_serve_stream_bounds_inflight_to_depth():
    """At most ``depth`` forwards are dispatched-but-unyielded at any
    moment -- depth=1 really is serialized serving (code-review
    regression: the bound was off by one)."""
    import numpy_quant_tpu as nq

    mlp = nq.onnx.load("numpy_quant_tpu/models/mlp.onnx")
    model = Model.from_onnx(mlp)
    xs = RNG.normal(size=(5, 16, 2)).astype(np.float32)

    dispatched = []
    orig_call = Model.__call__

    def counting_call(self, *a, **k):
        dispatched.append(1)
        return orig_call(self, *a, **k)

    for depth in (1, 2):
        dispatched.clear()
        seen = []
        Model.__call__ = counting_call
        try:
            gen = model.serve_stream(([x] for x in xs), depth=depth)
            for out in gen:
                seen.append(out)
                # when the k-th result arrives, at most depth-1 newer
                # requests may have been dispatched beyond it
                assert len(dispatched) <= len(seen) + depth - 1, depth
        finally:
            Model.__call__ = orig_call
        assert len(seen) == len(xs)

def test_serve_ring_matches_per_call(monkeypatch):
    """serve_ring (ONE persistent device program pulling each batch
    from the host through an input-ring io_callback) returns, in
    order, exactly what blocking per-batch __call__ returns -- float
    and quantized -- and the feed generator is consumed device-paced
    (one pull per step, inside the session). The runtime gate
    (serving.ring_supported) is forced on: this process runs the CPU
    backend in-process, where loop-embedded callbacks work, but the
    subprocess probe would inherit the tunnel env."""
    import numpy_quant_tpu as nq

    monkeypatch.setenv("NQ_TPU_RING", "1")
    mlp = nq.onnx.load("numpy_quant_tpu/models/mlp.onnx")
    model = Model.from_onnx(mlp)
    xs = RNG.normal(size=(6, 16, 2)).astype(np.float32)
    seq = [model([x])[0] for x in xs]

    pulled = []

    def live():
        for i, x in enumerate(xs):
            pulled.append(i)
            yield [x]

    got = model.serve_ring(live())
    assert len(got) == len(seq) and pulled == list(range(len(xs)))
    for g, s in zip(got, seq):
        np.testing.assert_array_equal(g[0], s)

    q = model.quantize([xs.reshape(-1, 2)], bit_width=8)
    qseq = [q([x])[0] for x in xs]
    qgot = q.serve_ring([x] for x in xs)
    for g, s in zip(qgot, qseq):
        np.testing.assert_array_equal(g[0], s)

    # session edge cases: empty feed; compiled-program reuse across
    # sessions; a mid-session signature change is a hard error
    assert model.serve_ring(iter([])) == []
    again = model.serve_ring([x] for x in xs[:2])
    assert len(again) == 2
    np.testing.assert_array_equal(again[1][0], seq[1])
    bad = [[xs[0]], [xs[1][:4]]]
    with pytest.raises(Exception, match="signature"):
        model.serve_ring(iter(bad))

    # an unsupported runtime raises up front instead of hanging
    monkeypatch.setenv("NQ_TPU_RING", "0")
    with pytest.raises(RuntimeError, match="map_batches"):
        model.serve_ring([x] for x in xs)
    # probe=False bypasses the gate (caller-asserted known-good runtime)
    bypass = model.serve_ring(([x] for x in xs[:1]), probe=False)
    assert len(bypass) == 1
