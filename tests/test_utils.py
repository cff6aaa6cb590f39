"""Utility subsystems: QModel serialization (checkpoint/resume gap-fill),
profile chart, summary."""
import numpy as np
import pytest

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


def test_qmodel_save_load_per_channel(tmp_path):
    # per-channel weight scales are VECTORS; they must serialize as
    # shaped lists and round-trip bit-exact (round-1 crash site)
    m = nq.onnx.load(MLP)
    model = nq.Model.from_onnx(m)
    X = RNG.normal(size=(128, 2)).astype(np.float32)
    qmodel = model.quantize([X], bit_width=4, per_channel_weights=True)
    expected = qmodel([X])[0]
    path = tmp_path / "mlp_q4_pc.onnx"
    save_qmodel(qmodel, path, m)
    q2 = load_qmodel(path)
    actual = q2([X])[0]
    np.testing.assert_array_equal(actual, expected)


def test_qmodel_save_load_packed(tmp_path):
    # packed sub-byte weights persist as uint8 bit-plane initializers
    # (exactly b bits/value on disk) and round-trip bit-exact.
    # ViT MatMul weights are the packable Constants (MLP's Gemm is not).
    from numpy_quant_tpu.models.vit import vit_image_classifier
    from transformers import ViTConfig
    rng = np.random.default_rng(3)
    cfg = ViTConfig(image_size=16, patch_size=4, hidden_size=16,
                    num_attention_heads=2, intermediate_size=32,
                    num_hidden_layers=1, num_labels=4)
    mv = vit_image_classifier(config=cfg, batch_size=2, seed=0)
    vit_model = nq.Model.from_onnx(mv)
    xv = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)
    qvit = vit_model.quantize([xv], bit_width=4)
    n_packed = qvit.pack_weights()
    assert n_packed > 0
    expected = qvit([xv])[0]
    path = tmp_path / "vit_q4_packed.onnx"
    save_qmodel(qvit, path, mv)
    q2 = load_qmodel(path)
    from numpy_quant_tpu.tensor import PackedQTensor
    from numpy_quant_tpu.graph import Constant
    n_loaded = sum(1 for v in q2.values
                   if isinstance(v, Constant)
                   and isinstance(v.data, PackedQTensor))
    assert n_loaded == n_packed
    np.testing.assert_array_equal(q2([xv])[0], expected)


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


def test_qmodel_save_load_packed_int8_native(tmp_path):
    # int8 "packing" is native int8 storage under the split-K layout;
    # it must round-trip through serialization like sub-byte payloads.
    from numpy_quant_tpu.models.vit import vit_image_classifier
    from transformers import ViTConfig
    rng = np.random.default_rng(4)
    cfg = ViTConfig(image_size=16, patch_size=4, hidden_size=16,
                    num_attention_heads=2, intermediate_size=32,
                    num_hidden_layers=1, num_labels=4)
    mv = vit_image_classifier(config=cfg, batch_size=2, seed=0)
    vit_model = nq.Model.from_onnx(mv)
    xv = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)
    q8 = vit_model.quantize([xv], bit_width=8)
    assert q8.pack_weights() > 0
    expected = q8([xv])[0]
    path = tmp_path / "vit_q8_packed.onnx"
    save_qmodel(q8, path, mv)
    q2 = load_qmodel(path)
    from numpy_quant_tpu.tensor import PackedQTensor
    layouts = {v.data.layout for v in q2.values
               if isinstance(getattr(v, "data", None), PackedQTensor)}
    assert layouts == {"splitk"}
    np.testing.assert_array_equal(q2([xv])[0], expected)


def test_summarize_device_trace(tmp_path):
    """summarize_device_trace parses a chrome-trace capture, keeps only
    device-track kernels, groups numbered instances, and excludes
    executable wrappers."""
    import gzip
    import json

    from numpy_quant_tpu.utils import summarize_device_trace

    d = tmp_path / "plugins" / "profile" / "2026_01_01"
    d.mkdir(parents=True)
    events = [
        {"ph": "M", "name": "process_name", "pid": 1,
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "name": "process_name", "pid": 2,
         "args": {"name": "host threads"}},
        {"ph": "X", "pid": 1, "name": "fusion.1", "ts": 0, "dur": 100},
        {"ph": "X", "pid": 1, "name": "fusion.2", "ts": 200, "dur": 300},
        {"ph": "X", "pid": 1, "name": "jit_fn", "ts": 0, "dur": 1000},
        {"ph": "X", "pid": 1, "name": "while.3", "ts": 0, "dur": 900},
        {"ph": "X", "pid": 1, "name": "custom-call.7", "ts": 50, "dur": 50},
        {"ph": "X", "pid": 2, "name": "fusion.9", "ts": 0, "dur": 777},
    ]
    with gzip.open(d / "vm.trace.json.gz", "wt") as fh:
        json.dump({"traceEvents": events}, fh)

    rows = summarize_device_trace(str(tmp_path))
    assert rows[0] == ("fusion", 400 / 1e6, 2)  # host pid-2 excluded
    names = [r[0] for r in rows]
    assert "jit_fn" not in names and "while" not in names
    assert ("custom-call", 50 / 1e6, 1) in rows


def test_export_qdq_roundtrip(tmp_path):
    """export_qdq emits a standard QDQ ONNX model that our own importer
    (QuantizeLinear/DequantizeLinear ops) runs; fake-quant f32 matches
    the integer QModel within accumulator rounding, on the MLP (Gemm,
    requantized outputs) and a small ViT (MatMul weights)."""
    from numpy_quant_tpu.utils import save_qmodel_qdq

    rng = np.random.default_rng(0)

    mlp = nq.onnx.load("numpy_quant_tpu/models/mlp.onnx")
    model = nq.Model.from_onnx(mlp)
    X = rng.normal(size=(64, 2)).astype(np.float32)
    q = model.quantize([X], bit_width=8)
    path = tmp_path / "mlp_qdq.onnx"
    save_qmodel_qdq(q, path, mlp)
    qdq = nq.Model.from_onnx(nq.onnx.load(path))
    ops = {n.op for n in qdq.nodes}
    assert "QuantizeLinear" in ops and "DequantizeLinear" in ops
    np.testing.assert_allclose(qdq([X])[0], q([X])[0], atol=1e-4)

    from numpy_quant_tpu.models.vit import vit_image_classifier
    from transformers import ViTConfig
    cfg = ViTConfig(image_size=16, patch_size=4, hidden_size=16,
                    num_attention_heads=2, intermediate_size=32,
                    num_hidden_layers=1, num_labels=4)
    mv = vit_image_classifier(config=cfg, batch_size=2, seed=0)
    vmodel = nq.Model.from_onnx(mv)
    xv = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)
    qv = vmodel.quantize([xv], bit_width=8)
    vpath = tmp_path / "vit_qdq.onnx"
    save_qmodel_qdq(qv, vpath, mv)
    qdqv = nq.Model.from_onnx(nq.onnx.load(vpath))
    # fake-quant f32 accumulates with different rounding than the exact
    # integer path; a few-ulp difference can flip an occasional rint by
    # one quantization step, so the ViT comparison is statistical
    a, b = qv([xv])[0], qdqv([xv])[0]
    assert np.abs(a - b).mean() < 0.02, np.abs(a - b).mean()
    assert np.array_equal(a.argmax(1), b.argmax(1))


def test_merge_calibration_stats_equals_one_batch():
    """Batch-at-a-time calibration merged with merge_calibration_stats
    equals one-big-batch calibration (global min/max is associative)."""
    from numpy_quant_tpu.utils import merge_calibration_stats

    mlp = nq.onnx.load("numpy_quant_tpu/models/mlp.onnx")
    model = nq.Model.from_onnx(mlp)
    rng = np.random.default_rng(7)
    X = rng.normal(size=(128, 2)).astype(np.float32)
    full = model.calibration_stats([X])
    merged = merge_calibration_stats(model.calibration_stats([X[:64]]),
                                     model.calibration_stats([X[64:]]))
    assert set(full) == set(merged)
    for name in full:
        np.testing.assert_allclose(merged[name], full[name], rtol=1e-6,
                                   err_msg=name)
    # quantizing from the merged stats works end-to-end
    q = model.quantize(bit_width=8, stats=merged)
    assert np.all(np.isfinite(q([X])[0]))


def test_export_qdq_per_channel_square_weight(tmp_path):
    """Per-channel weights export with the CONSUMER-derived channel
    axis -- a square weight makes shape-matching ambiguous (Gemm transB
    channels live on axis 0)."""
    from numpy_quant_tpu.utils import save_qmodel_qdq
    from numpy_quant_tpu import onnx as O

    rng = np.random.default_rng(0)
    D = 6  # square weight
    w = rng.normal(size=(D, D)).astype(np.float32) * 0.3
    b = rng.normal(size=D).astype(np.float32) * 0.1
    inp = O.make_tensor_value_info("x", O.TensorProto.FLOAT, [8, D])
    out = O.make_tensor_value_info("y", O.TensorProto.FLOAT, None)
    node = O.make_node("Gemm", ["x", "w", "b"], ["y"], name="g", transB=1)
    g = O.make_graph([node], "g", [inp], [out],
                     initializer=[O.from_array(w, "w"), O.from_array(b, "b")])
    src = O.make_model(g)
    model = nq.Model.from_onnx(src)
    x = rng.normal(size=(8, D)).astype(np.float32)
    q = model.quantize([x], bit_width=8, per_channel_weights=True)
    path = tmp_path / "gemm_pc_qdq.onnx"
    save_qmodel_qdq(q, path, src)
    loaded = nq.onnx.load(path)
    dqw = next(n for n in loaded.graph.node if n.name == "DQ_w")
    assert nq.onnx.get_attribute_value(
        next(a for a in dqw.attribute if a.name == "axis")) == 0
    qdq = nq.Model.from_onnx(loaded)
    np.testing.assert_allclose(qdq([x])[0], q([x])[0], atol=1e-4)


def test_export_qdq_per_channel_gemm_with_bias(tmp_path):
    """Per-channel Gemm export incl. the 1-D bias (vector scale, axis 0)
    round-trips within fake-quant tolerance."""
    from numpy_quant_tpu.utils import save_qmodel_qdq
    from numpy_quant_tpu import onnx as O

    rng = np.random.default_rng(1)
    w = rng.normal(size=(5, 7)).astype(np.float32) * 0.4
    b = rng.normal(size=5).astype(np.float32) * 0.2
    inp = O.make_tensor_value_info("x", O.TensorProto.FLOAT, [6, 7])
    out = O.make_tensor_value_info("y", O.TensorProto.FLOAT, None)
    node = O.make_node("Gemm", ["x", "w", "b"], ["y"], name="g", transB=1)
    g = O.make_graph([node], "g", [inp], [out],
                     initializer=[O.from_array(w, "w"), O.from_array(b, "b")])
    src = O.make_model(g)
    model = nq.Model.from_onnx(src)
    x = rng.normal(size=(6, 7)).astype(np.float32)
    q = model.quantize([x], bit_width=8, per_channel_weights=True)
    path = tmp_path / "gemm_pc_bias_qdq.onnx"
    save_qmodel_qdq(q, path, src)
    qdq = nq.Model.from_onnx(nq.onnx.load(path))
    np.testing.assert_allclose(qdq([x])[0], q([x])[0], atol=1e-3)


def test_export_qdq_after_optimize_and_pack(tmp_path):
    """QDQ export composes with the serving transforms: a W4A8,
    optimize()d (fused attention + early-int8), pack_weights()ed QModel
    exports from the SOURCE graph structure with unpacked int8/int4
    payloads and still matches the integer path statistically."""
    from numpy_quant_tpu.utils import save_qmodel_qdq
    from numpy_quant_tpu.models.vit import vit_image_classifier
    from transformers import ViTConfig

    rng = np.random.default_rng(2)
    cfg = ViTConfig(image_size=16, patch_size=4, hidden_size=16,
                    num_attention_heads=2, intermediate_size=32,
                    num_hidden_layers=1, num_labels=4)
    mv = vit_image_classifier(config=cfg, batch_size=2, seed=0)
    model = nq.Model.from_onnx(mv)
    xv = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)
    q = model.quantize([xv], bit_width=8, weight_bit_width=4,
                       per_channel_weights=True)
    q.optimize()
    assert q.pack_weights() > 0
    expected = q([xv])[0]
    path = tmp_path / "vit_w4a8_qdq.onnx"
    save_qmodel_qdq(q, path, mv)
    qdq = nq.Model.from_onnx(nq.onnx.load(path))
    a, b = expected, qdq([xv])[0]
    assert np.abs(a - b).mean() < 0.05, np.abs(a - b).mean()
    assert np.array_equal(a.argmax(1), b.argmax(1))


def test_export_qdq_after_merge_parallel_matmuls(tmp_path):
    """A merged QModel (MatMulSplit) exports its merged weights as
    per-initializer int8 payloads sliced back out of the merged tensor
    (ADVICE r2: they used to silently export as float initializers)."""
    from numpy_quant_tpu.models import vit as V
    from numpy_quant_tpu.utils import save_qmodel_qdq

    rng = np.random.default_rng(3)
    m = V.vit(2, 16, 4, 24, 16, 4)
    x = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)
    model = nq.Model.from_onnx(m)
    qmodel = model.quantize([x], bit_width=8)
    assert qmodel.merge_parallel_matmuls() > 0
    merged_out = qmodel([x])[0]
    src_names = [n for node in qmodel.nodes if node.op == "MatMulSplit"
                 for n in node.attrs["source_weights"]]
    assert src_names

    path = tmp_path / "merged_qdq.onnx"
    save_qmodel_qdq(qmodel, path, m)
    proto = nq.onnx.load(path)
    init_names = {i.name for i in proto.graph.initializer}
    # every source weight went out as an int8 payload + DQ scale
    for name in src_names:
        assert name + "/q" in init_names, name
        assert name + "/q_scale" in init_names, name
    qdq = nq.Model.from_onnx(proto)
    a, b = merged_out, qdq([x])[0]
    assert np.abs(a - b).mean() < 0.02, np.abs(a - b).mean()
    assert np.array_equal(a.argmax(1), b.argmax(1))


def test_aot_save_load_compiled(tmp_path):
    """utils.aot: the COMPILED program round-trips through jax.export
    serialization -- the loaded artifact needs no graph/ONNX/framework
    state and reproduces the QModel's outputs bit-exactly (int8
    dataflow, fusions and packed payload unpacking are baked into the
    StableHLO; params ride beside it as arguments)."""
    import numpy_quant_tpu as nq
    from numpy_quant_tpu.models.vit import vit
    from numpy_quant_tpu.utils.aot import load_compiled, save_compiled

    rng = np.random.default_rng(7)
    model = nq.Model.from_onnx(vit(1, 12, 4, 24, 16, 2, 2, 4))
    x = rng.normal(size=(1, 3, 12, 12)).astype(np.float32)
    qmodel = model.quantize([x], bit_width=8)
    qmodel.optimize()
    qmodel.pack_weights()
    want = [np.asarray(o) for o in qmodel([x])]

    p = str(tmp_path / "vit_int8.npz")
    save_compiled(qmodel, p, [x])
    fn = load_compiled(p)
    got = fn([x])
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)

    # float model round-trips too
    p2 = str(tmp_path / "vit_f32.npz")
    save_compiled(model, p2, [x])
    np.testing.assert_array_equal(load_compiled(p2)([x])[0],
                                  np.asarray(model([x])[0]))

    with pytest.raises(ValueError):
        np.savez(str(tmp_path / "bad.npz"), a=np.zeros(3))
        load_compiled(str(tmp_path / "bad.npz"))


def test_save_qmodel_external_data(tmp_path):
    """save_qmodel(external_data_threshold=) splits big int payloads
    into the .data side file; load_qmodel round-trips bit-exactly."""
    m = nq.onnx.load(MLP)
    model = nq.Model.from_onnx(m)
    x = RNG.normal(size=(16, 2)).astype(np.float32)
    q = model.quantize([x], bit_width=8)
    want = np.asarray(q([x])[0])

    p = str(tmp_path / "q_ext.onnx")
    save_qmodel(q, p, m, external_data_threshold=16)
    import os
    assert os.path.exists(p + ".data")
    q2 = load_qmodel(p)
    np.testing.assert_array_equal(np.asarray(q2([x])[0]), want)


def test_aot_decode_loop_roundtrip(tmp_path):
    """save_decode_loop/load_decode_loop: the WHOLE decode loop
    (teacher-forced prefill + generation) round-trips through a
    StableHLO artifact -- reloaded with jax+numpy alone, token-equal to
    generate_kv on the trained fixture, at full task accuracy."""
    from numpy_quant_tpu.models import text_fixture as TF
    from numpy_quant_tpu.utils import generate_kv
    from numpy_quant_tpu.utils.aot import load_decode_loop, save_decode_loop

    proto = TF.trained_gpt_decode_onnx(batch_size=4)
    model = nq.Model.from_onnx(proto)
    prompts, expected = TF.make_prompts(np.random.default_rng(9), 4)
    prompts = prompts.astype(np.int32)
    want = generate_kv(model, prompts, proto._wte, proto._wpe,
                       max_new_tokens=TF.COPY_LEN)

    path = str(tmp_path / "decode_loop.npz")
    save_decode_loop(model, path, proto._wte, proto._wpe, prompts,
                     max_new_tokens=TF.COPY_LEN)
    fn = load_decode_loop(path)
    got = fn(prompts)
    np.testing.assert_array_equal(got, want)
    assert TF.copy_accuracy(got[:, TF.COPY_LEN + 1:], expected) == 1.0
    # a DIFFERENT prompt batch through the same artifact
    p2, e2 = TF.make_prompts(np.random.default_rng(10), 4)
    got2 = fn(p2.astype(np.int32))
    np.testing.assert_array_equal(
        got2, generate_kv(model, p2.astype(np.int32), proto._wte,
                          proto._wpe, max_new_tokens=TF.COPY_LEN))

    # wrong-artifact guard
    import pytest
    from numpy_quant_tpu.utils.aot import load_compiled
    with pytest.raises(ValueError, match="decode"):
        load_compiled(path)


def _run_bench_supervisor(child_code, budget="3"):
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, NQ_TPU_BENCH_CHILD_CMD=child_code,
               NQ_TPU_BENCH_BUDGET=budget)
    env.pop("NQ_TPU_BENCH_CHILD", None)
    return subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        capture_output=True, text=True, timeout=60, env=env)


def test_bench_supervisor_keeps_best_so_far_on_budget_kill():
    """The benchmark-of-record contract (VERDICT round-3 item 1): a
    child that printed a measurement and then hangs is killed at the
    budget and the run still exits 0 with the parseable line kept."""
    r = _run_bench_supervisor(
        "import time,sys;"
        "print('{\"value\": 1.0, \"metric\": \"m\"}', flush=True);"
        "time.sleep(60)")
    assert r.returncode == 0, (r.returncode, r.stderr[-500:])
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    assert lines and '"value"' in lines[-1]
    assert "budget" in r.stderr


def test_bench_supervisor_no_measurement_is_rc1():
    """A child that hangs before ANY measurement must not fake one:
    budget kill, rc 1, no JSON line."""
    r = _run_bench_supervisor("import time; time.sleep(60)")
    assert r.returncode == 1
    assert not [ln for ln in r.stdout.splitlines() if ln.startswith("{")]


def test_bench_supervisor_passes_through_fast_child():
    """A child finishing inside the budget relays its lines and rc 0."""
    r = _run_bench_supervisor(
        "print('{\"value\": 2.0, \"metric\": \"m\"}')", budget="30")
    assert r.returncode == 0
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    assert lines == ['{"value": 2.0, "metric": "m"}']
