"""Multi-chip execution on the 8-device virtual CPU mesh: DP-sharded
inference + calibration, Megatron-style TP for ViT, and DP x TP combined.
The reference has none of this (SURVEY.md §2.3); collectives are
XLA-GSPMD-inserted from sharding annotations."""
import numpy as np
import pytest

import jax

import numpy_quant_tpu as nq
from numpy_quant_tpu import parallel as par
from numpy_quant_tpu.models import vit as V

RNG = np.random.default_rng(0)

requires_8_devices = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


def _small_vit(batch):
    m = V.vit(batch, 16, 4, 22, 8, 2)
    return m


@requires_8_devices
def test_dp_inference_matches_single_device():
    m = _small_vit(8)
    x = RNG.normal(size=(8, 3, 16, 16)).astype(np.float32)
    model = nq.Model.from_onnx(m)
    expected = model([x])[0]

    sharded = nq.Model.from_onnx(m)
    mesh = par.make_mesh(8, axes=("data",))
    par.shard_model(sharded, mesh)
    actual = sharded([x])[0]
    np.testing.assert_allclose(actual, expected, atol=1e-6)


@requires_8_devices
def test_dp_calibration_matches_single_device():
    """Min/max stats are associative reductions -> DP sharding changes
    nothing (SURVEY.md §2.3 disposition)."""
    m = _small_vit(8)
    x = RNG.normal(size=(8, 3, 16, 16)).astype(np.float32)
    model = nq.Model.from_onnx(m)
    stats = model.calibration_stats([x])

    sharded = nq.Model.from_onnx(m)
    par.shard_model(sharded, par.make_mesh(8, axes=("data",)))
    sharded_stats = sharded.calibration_stats([x])

    assert set(stats) == set(sharded_stats)
    for name in stats:
        np.testing.assert_allclose(stats[name][0], sharded_stats[name][0],
                                   atol=1e-6, err_msg=name)
        np.testing.assert_allclose(stats[name][1], sharded_stats[name][1],
                                   atol=1e-6, err_msg=name)


@requires_8_devices
def test_tp_inference_matches_single_device():
    m = V.vit(4, 16, 4, 24, 16, 4)  # head dim divisible by tp
    x = RNG.normal(size=(4, 3, 16, 16)).astype(np.float32)
    model = nq.Model.from_onnx(m)
    expected = model([x])[0]

    sharded = nq.Model.from_onnx(m)
    mesh = par.make_dp_tp_mesh(8, tp=4)
    par.shard_model(sharded, mesh, data_axis="data", rules=par.vit_tp_rules)
    actual = sharded([x])[0]
    np.testing.assert_allclose(actual, expected, atol=1e-5)

    # TP annotations actually landed on the placed parameters
    placed = sharded._placed_params()
    qk = next(n for n in placed if n.endswith(".query.weight_t"))
    from jax.sharding import PartitionSpec as P
    assert placed[qk].sharding.spec == P(None, "model")


@requires_8_devices
def test_dp_tp_quantized_inference():
    m = V.vit(8, 16, 4, 24, 16, 4)
    x = RNG.normal(size=(8, 3, 16, 16)).astype(np.float32)
    model = nq.Model.from_onnx(m)
    qmodel = model.quantize([x], bit_width=8)
    expected = qmodel([x])[0]

    mesh = par.make_dp_tp_mesh(8, tp=2)
    par.shard_model(qmodel, mesh, data_axis="data", rules=par.vit_tp_rules)
    qmodel._jit_cache.clear()
    actual = qmodel([x])[0]
    # integer path: sharded result must be bit-comparable to single-dev
    np.testing.assert_allclose(actual, expected, atol=1e-5)


@requires_8_devices
def test_mlp_dp_quantized():
    mlp = nq.onnx.load("numpy_quant_tpu/models/mlp.onnx")
    X = RNG.normal(size=(800, 2)).astype(np.float32)
    model = nq.Model.from_onnx(mlp)
    qmodel = model.quantize([X], bit_width=8)
    expected = qmodel([X])[0]

    par.shard_model(qmodel, par.make_mesh(8, axes=("data",)))
    qmodel._jit_cache.clear()
    actual = qmodel([X])[0]
    np.testing.assert_array_equal(actual, expected)


@requires_8_devices
def test_dp_tp_optimized_bit_exact_trained_vit():
    """DP x TP quantized inference WITH the fused attention kernel and
    the int8_dataflow pass is BIT-EXACT vs single device, on the
    trained 4-layer ViT fixture (realistic dims: hidden 128, 4 heads,
    65 tokens). Integer collectives are exact (int32 psum), float
    segments stay replicated per data shard under the Megatron rules,
    and the Pallas kernel runs under shard_map over (data, model)."""
    from numpy_quant_tpu.models import fixtures as F

    m = F.trained_vit_onnx(batch_size=8)
    x, _ = F.make_batch(np.random.default_rng(5), 8)

    single = nq.Model.from_onnx(m)
    calib, _ = F.make_batch(np.random.default_rng(6), 4)
    q_single = single.quantize([calib], bit_width=8)
    stats_opt = q_single.optimize()
    assert stats_opt["fuse_attention"] == 4  # one per layer (HS kernel)
    expected = q_single([x])[0]

    sharded = nq.Model.from_onnx(m)
    q_sharded = sharded.quantize([calib], bit_width=8)
    q_sharded.optimize()
    mesh = par.make_dp_tp_mesh(8, tp=2)
    par.shard_model(q_sharded, mesh, data_axis="data", rules=par.vit_tp_rules)
    actual = q_sharded([x])[0]
    np.testing.assert_array_equal(actual, expected)


@requires_8_devices
def test_dp_fused_attention_bit_exact():
    """Pure DP (8-way) with the fused attention kernel: bit-exact vs
    single device."""
    from numpy_quant_tpu.models import fixtures as F

    m = F.trained_vit_onnx(batch_size=8)
    x, _ = F.make_batch(np.random.default_rng(15), 8)
    calib, _ = F.make_batch(np.random.default_rng(16), 4)

    single = nq.Model.from_onnx(m)
    q_single = single.quantize([calib], bit_width=8)
    q_single.fuse_attention()
    expected = q_single([x])[0]

    sharded = nq.Model.from_onnx(m)
    q_sharded = sharded.quantize([calib], bit_width=8)
    q_sharded.fuse_attention()
    par.shard_model(q_sharded, par.make_mesh(8, axes=("data",)))
    np.testing.assert_array_equal(q_sharded([x])[0], expected)


@requires_8_devices
def test_tp_packed_weights_shard_over_model_axis():
    """Packed sub-byte payloads shard over the model axis where the
    logical weight is column-sharded (ROADMAP: packed planes no longer
    replicate across the mesh), and the packed DP x TP forward matches
    the unpacked one bit-for-bit."""
    from jax.sharding import PartitionSpec as P
    from numpy_quant_tpu.tensor import PackedQTensor

    m = V.vit(8, 16, 4, 24, 16, 4)
    x = RNG.normal(size=(8, 3, 16, 16)).astype(np.float32)
    model = nq.Model.from_onnx(m)
    qmodel = model.quantize([x], bit_width=8)
    mesh = par.make_dp_tp_mesh(8, tp=2)
    par.shard_model(qmodel, mesh, data_axis="data", rules=par.vit_tp_rules)
    expected = qmodel([x])[0]

    assert qmodel.pack_weights() >= 3
    # column-sharded packed payloads carry a model-axis sharding
    packed_names = [v.name for v in qmodel.values
                    if isinstance(getattr(v, "data", None), PackedQTensor)]
    col_sharded = [n for n in packed_names
                   if tuple(par.vit_tp_rules(n, 2)) == (None, "model")]
    assert col_sharded, packed_names
    for name in col_sharded:
        planes_sh, colsum_sh = qmodel.parameter_shardings[name]
        assert planes_sh.spec == P(None, "model"), (name, planes_sh.spec)
        assert colsum_sh.spec == P(None, "model"), (name, colsum_sh.spec)
    placed = qmodel._placed_params()
    for name in col_sharded:
        planes, _ = placed[name]
        assert planes.sharding.spec == P(None, "model"), name

    actual = qmodel([x])[0]
    np.testing.assert_array_equal(actual, expected)


@requires_8_devices
def test_w4a8_full_stack_dp_tp():
    """The full serving stack composed: W4A8 per-channel weights +
    fused attention + early-int8 layout + packed split-K weights +
    DP x TP sharding — one configuration, bit-identical to the same
    stack on a single device."""
    m = V.vit(8, 16, 4, 24, 16, 4)
    x = RNG.normal(size=(8, 3, 16, 16)).astype(np.float32)
    model = nq.Model.from_onnx(m)

    def build():
        q = model.quantize([x], bit_width=8, weight_bit_width=4,
                           per_channel_weights=True)
        q.optimize()
        assert q.pack_weights() > 0
        return q

    expected = build()([x])[0]
    q2 = build()
    mesh = par.make_dp_tp_mesh(8, tp=2)
    par.shard_model(q2, mesh, data_axis="data", rules=par.vit_tp_rules)
    np.testing.assert_array_equal(q2([x])[0], expected)


@requires_8_devices
def test_merge_parallel_matmuls_under_mesh():
    """merge_parallel_matmuls on a sharded QModel refreshes
    parameter_shardings for the new merged params (regression: the next
    forward used to die with KeyError '<node>/merged_w')."""
    m = V.vit(8, 16, 4, 24, 16, 4)
    x = RNG.normal(size=(8, 3, 16, 16)).astype(np.float32)
    model = nq.Model.from_onnx(m)
    qmodel = model.quantize([x], bit_width=8)
    expected = qmodel([x])[0]
    mesh = par.make_dp_tp_mesh(8, tp=2)
    par.shard_model(qmodel, mesh, data_axis="data", rules=par.vit_tp_rules)
    assert qmodel.merge_parallel_matmuls() > 0
    np.testing.assert_array_equal(qmodel([x])[0], expected)


@requires_8_devices
def test_tp_row_sharded_packed_payloads():
    """Row-(K-)sharded weights re-pack per device into the stacked
    layout (tensor.pack_qtensor shards>1): per-device payload bytes
    HALVE at tp=2 instead of silently replicating, and the forward
    stays bit-identical to the unsharded packed model."""
    from jax.sharding import PartitionSpec as P
    from numpy_quant_tpu.tensor import PackedQTensor

    m = V.vit(8, 16, 4, 24, 16, 4)
    x = RNG.normal(size=(8, 3, 16, 16)).astype(np.float32)
    model = nq.Model.from_onnx(m)

    # unsharded packed baseline
    q_base = model.quantize([x], bit_width=8, weight_bit_width=4,
                            per_channel_weights=True)
    assert q_base.pack_weights() > 0
    expected = q_base([x])[0]

    qmodel = model.quantize([x], bit_width=8, weight_bit_width=4,
                            per_channel_weights=True)
    mesh = par.make_dp_tp_mesh(8, tp=2)
    par.shard_model(qmodel, mesh, data_axis="data", rules=par.vit_tp_rules)
    assert qmodel.pack_weights() > 0

    row_sharded = [
        v for v in qmodel.values
        if isinstance(getattr(v, "data", None), PackedQTensor)
        and tuple(par.vit_tp_rules(v.name, 2)) == ("model", None)]
    assert row_sharded, "expected row-sharded packed weights (attention "\
        "output + MLP down projections)"
    placed = qmodel._placed_params()
    for v in row_sharded:
        assert v.data.layout == "splitk_stacked", (v.name, v.data.layout)
        assert v.data.planes.shape[0] == 2, v.name  # one group per device
        planes_sh, colsum_sh = qmodel.parameter_shardings[v.name]
        assert planes_sh.spec == P("model", None, None), \
            (v.name, planes_sh.spec)
        planes, _ = placed[v.name]
        total = planes.nbytes
        for shard in planes.addressable_shards:
            # each device materializes HALF the payload bytes
            assert shard.data.nbytes * 2 == total, v.name
        break  # shard inspection once is enough; asserts above run for all

    actual = qmodel([x])[0]
    np.testing.assert_array_equal(actual, expected)


@requires_8_devices
def test_stacked_packed_serialization_roundtrip():
    """save_qmodel/load_qmodel round-trip the TP-stacked payload
    (layout metadata + per-shard unpack at load)."""
    import tempfile, os
    from numpy_quant_tpu.utils.serialization import load_qmodel, save_qmodel

    m = V.vit(8, 16, 4, 24, 16, 4)
    x = RNG.normal(size=(8, 3, 16, 16)).astype(np.float32)
    model = nq.Model.from_onnx(m)
    qmodel = model.quantize([x], bit_width=8, weight_bit_width=4,
                            per_channel_weights=True)
    mesh = par.make_dp_tp_mesh(8, tp=2)
    par.shard_model(qmodel, mesh, data_axis="data", rules=par.vit_tp_rules)
    assert qmodel.pack_weights() > 0
    expected = qmodel([x])[0]

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "q.onnx")
        save_qmodel(qmodel, path, m)
        loaded = load_qmodel(path)
    out = loaded([x])[0]
    np.testing.assert_array_equal(out, expected)


@requires_8_devices
def test_tp_bert_text_quantized():
    """vit_tp_rules cover the BERT text graphs unchanged (same emitter
    naming): DP x TP quantized inference matches single-device. The
    int64 token ids ride the host shape domain, so only parameters and
    activations shard."""
    from numpy_quant_tpu.models.text import bert_text_classifier

    m = bert_text_classifier(batch_size=8, seq_len=12, seed=5)
    ids = RNG.integers(0, 96, size=(8, 12)).astype(np.int64)
    model = nq.Model.from_onnx(m)
    qmodel = model.quantize([ids], bit_width=8)
    expected = qmodel([ids])[0]

    mesh = par.make_dp_tp_mesh(8, tp=2)
    par.shard_model(qmodel, mesh, data_axis="data", rules=par.vit_tp_rules)
    np.testing.assert_allclose(qmodel([ids])[0], expected, atol=1e-5)

    placed = qmodel._placed_params()
    from jax.sharding import PartitionSpec as P
    qk = next(n for n in placed if n.endswith(".query.weight_t"))
    assert placed[qk].sharding.spec == P(None, "model")


@requires_8_devices
def test_tp_gpt_quantized_generation():
    """gpt_tp_rules: merged-QKV/vocab-head column-sharded, projections
    row-sharded. The quantized forward AND the one-program generation
    loop match the single-device run under DP x TP."""
    from numpy_quant_tpu.models.gpt import gpt_causal_lm
    from numpy_quant_tpu.utils import generate

    proto = gpt_causal_lm(batch_size=4, seq_len=12, seed=2)
    embeds = RNG.normal(size=(4, 12, 32)).astype(np.float32)
    model = nq.Model.from_onnx(proto)
    qmodel = model.quantize([embeds], bit_width=8)
    expected = qmodel([embeds])[0]
    prompt = RNG.integers(0, 96, size=(4, 4)).astype(np.int32)
    seq = generate(qmodel, prompt, proto._wte, max_new_tokens=6)

    mesh = par.make_dp_tp_mesh(8, tp=2)
    par.shard_model(qmodel, mesh, data_axis="data", rules=par.gpt_tp_rules)
    np.testing.assert_allclose(qmodel([embeds])[0], expected, atol=1e-5)
    np.testing.assert_array_equal(
        generate(qmodel, prompt, proto._wte, max_new_tokens=6), seq)

    placed = qmodel._placed_params()
    from jax.sharding import PartitionSpec as P
    ca = next(n for n in placed if n.endswith(".attn.c_attn.weight"))
    assert placed[ca].sharding.spec == P(None, "model")
    head = next(n for n in placed if n == "lm_head.weight_t")
    assert placed[head].sharding.spec == P(None, "model")


@requires_8_devices
def test_tp_llama_quantized_generation():
    """llama_tp_rules: separate q/k/v + SwiGLU gate/up column-sharded,
    o_proj/down_proj row-sharded, vocab-parallel head. The quantized
    GQA forward AND the one-program generation loop match the
    single-device run under DP x TP."""
    from numpy_quant_tpu.models.llama import llama_causal_lm
    from numpy_quant_tpu.utils import generate

    proto = llama_causal_lm(batch_size=4, seq_len=12, seed=2)
    embeds = RNG.normal(size=(4, 12, 32)).astype(np.float32)
    model = nq.Model.from_onnx(proto)
    qmodel = model.quantize([embeds], bit_width=8)
    expected = qmodel([embeds])[0]
    prompt = RNG.integers(0, 96, size=(4, 4)).astype(np.int32)
    seq = generate(qmodel, prompt, proto._wte, max_new_tokens=6)

    mesh = par.make_dp_tp_mesh(8, tp=2)
    par.shard_model(qmodel, mesh, data_axis="data",
                    rules=par.llama_tp_rules)
    np.testing.assert_allclose(qmodel([embeds])[0], expected, atol=1e-5)
    np.testing.assert_array_equal(
        generate(qmodel, prompt, proto._wte, max_new_tokens=6), seq)

    placed = qmodel._placed_params()
    from jax.sharding import PartitionSpec as P
    qp = next(n for n in placed if n.endswith(".q_proj.weight_t"))
    assert placed[qp].sharding.spec == P(None, "model")
    dp = next(n for n in placed if n.endswith(".down_proj.weight_t"))
    assert placed[dp].sharding.spec == P("model", None)
    head = next(n for n in placed if n == "lm_head.weight_t")
    assert placed[head].sharding.spec == P(None, "model")


@requires_8_devices
def test_weight_only_dp_tp():
    """A weight-only (int8 weights, float compute) LLaMA shards like
    any float model: DP x TP outputs and generation match the
    single-device weight-only run."""
    from numpy_quant_tpu.models.llama import llama_causal_lm
    from numpy_quant_tpu.utils import generate

    proto = llama_causal_lm(batch_size=4, seq_len=12, seed=2)
    model = nq.Model.from_onnx(proto)
    model.quantize_weights(bit_width=8)
    embeds = RNG.normal(size=(4, 12, 32)).astype(np.float32)
    expected = np.asarray(model([embeds])[0])
    prompt = RNG.integers(0, 96, size=(4, 4)).astype(np.int32)
    seq = generate(model, prompt, proto._wte, max_new_tokens=5)

    mesh = par.make_dp_tp_mesh(8, tp=2)
    par.shard_model(model, mesh, data_axis="data",
                    rules=par.llama_tp_rules)
    np.testing.assert_allclose(np.asarray(model([embeds])[0]), expected,
                               atol=1e-5)
    np.testing.assert_array_equal(
        generate(model, prompt, proto._wte, max_new_tokens=5), seq)


@requires_8_devices
def test_tp_kv_decode_matches_single_device():
    """TP-over-heads KV-cache DECODE: generate_kv over a DP x TP mesh
    -- the [B, heads, L, D] cache carries ride the one-program decode
    loop with column-sharded QKV / row-sharded projections -- produces
    the SAME tokens as the single-device decode, float and int8-carry
    (VERDICT.md round-3 item 9: the serving path's multi-device
    correctness)."""
    from numpy_quant_tpu.models.gpt import gpt_decode_step
    from numpy_quant_tpu.utils import (decode_calibration, generate_kv,
                                       merge_calibration_stats)

    proto = gpt_decode_step(batch_size=4, max_len=12, seed=2)
    model = nq.Model.from_onnx(proto)
    prompt = RNG.integers(0, 96, size=(4, 4)).astype(np.int32)
    f_seq = generate_kv(model, prompt, proto._wte, proto._wpe,
                        max_new_tokens=6)

    mesh = par.make_dp_tp_mesh(8, tp=2)
    par.shard_model(model, mesh, data_axis="data", rules=par.gpt_tp_rules)
    np.testing.assert_array_equal(
        generate_kv(model, prompt, proto._wte, proto._wpe,
                    max_new_tokens=6), f_seq)

    # quantized step model: float carry AND int8 cache carry
    q = nq.Model.from_onnx(proto)
    batches = decode_calibration(q, prompt, proto._wte, proto._wpe)
    stats = merge_calibration_stats(
        *[q.calibration_stats(b) for b in batches])
    qm = q.quantize(stats=stats, bit_width=8)
    q_seq = generate_kv(qm, prompt, proto._wte, proto._wpe,
                        max_new_tokens=6)
    par.shard_model(qm, mesh, data_axis="data", rules=par.gpt_tp_rules)
    np.testing.assert_array_equal(
        generate_kv(qm, prompt, proto._wte, proto._wpe,
                    max_new_tokens=6), q_seq)
    np.testing.assert_array_equal(
        generate_kv(qm, prompt, proto._wte, proto._wpe,
                    max_new_tokens=6, kv_cache_dtype="int8"), q_seq)


@requires_8_devices
def test_tp_continuous_batcher_matches_single_device():
    """ContinuousBatcher over a TP-sharded step model: a ragged
    2x-oversubscribed workload produces the same per-request token rows
    as the unsharded engine (slot caches and block tables live on the
    mesh; the per-step program runs under GSPMD)."""
    from numpy_quant_tpu.models.gpt import gpt_decode_step
    from numpy_quant_tpu.utils import ContinuousBatcher

    proto = gpt_decode_step(batch_size=4, max_len=12, seed=2)
    workload = [(RNG.integers(0, 96, size=(1 + i % 4,)).astype(np.int32), 5)
                for i in range(8)]

    model = nq.Model.from_onnx(proto)
    cb = ContinuousBatcher(model, proto._wte, proto._wpe)
    expected = [np.asarray(r) for r in cb.run(workload)]

    sharded = nq.Model.from_onnx(proto)
    mesh = par.make_dp_tp_mesh(8, tp=2)
    par.shard_model(sharded, mesh, data_axis="data",
                    rules=par.gpt_tp_rules)
    cb2 = ContinuousBatcher(sharded, proto._wte, proto._wpe)
    got = [np.asarray(r) for r in cb2.run(workload)]
    assert len(got) == len(expected)
    for g, e in zip(got, expected):
        np.testing.assert_array_equal(g, e)


@requires_8_devices
def test_pipeline_parallel_gpipe_matches_single_device():
    """GPipe pipeline parallelism (parallel/pipeline.py): the trained
    GPT splits into 4 stages at residual cut points; the whole
    schedule is ONE shard_map program over a 4-device 'pipe' axis with
    ppermute moving microbatch activations between stages. Outputs
    match the unpipelined model to f32 ulps (XLA tiles the dots
    differently at microbatch size; the values are the same numbers up
    to reduction-order rounding) with exact argmax. Weight-only stages
    pipeline too, and QModel stages pipeline via float boundary
    passthrough (cuts restricted to float-executing residual values;
    interior stages neither quantize their input nor dequantize their
    output, so the op sequence is the unpipelined one's)."""
    from numpy_quant_tpu.models import text_fixture as TF
    from numpy_quant_tpu.parallel.mesh import make_mesh
    from numpy_quant_tpu.parallel.pipeline import (pipeline_forward,
                                                   split_stages)

    B, M, S = 8, 4, 4
    proto = TF.trained_gpt_onnx(batch_size=B)
    model = nq.Model.from_onnx(proto)
    ids = TF.make_copy_batch(np.random.default_rng(4), B)
    x = np.take(proto._wte, ids, axis=0).astype(np.float32)
    want = np.asarray(model([x])[0])

    stages = split_stages(model, S)
    assert len(stages) == S
    mesh = make_mesh(S, axes=("pipe",), shape=(S,))
    got = pipeline_forward(stages, mesh, x,
                           (want.shape, want.dtype), n_microbatches=M)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))

    # weight-only stages (int8 weights, float compute) pipeline exactly
    wmodel = nq.Model.from_onnx(proto)
    wmodel.quantize_weights(bit_width=8)
    w_want = np.asarray(wmodel([x])[0])
    w_stages = split_stages(wmodel, S)
    w_got = pipeline_forward(w_stages, mesh, x,
                             (w_want.shape, w_want.dtype),
                             n_microbatches=M)
    np.testing.assert_allclose(w_got, w_want, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(w_got.argmax(-1), w_want.argmax(-1))

    # 2-stage split on a 2-device pipe also exact (different balance)
    mesh2 = make_mesh(2, axes=("pipe",), shape=(2,))
    got2 = pipeline_forward(split_stages(model, 2), mesh2, x,
                            (want.shape, want.dtype), n_microbatches=4)
    np.testing.assert_allclose(got2, want, rtol=1e-4, atol=1e-5)

    # QModel (full-int8) stages: float boundary passthrough keeps the
    # pipelined op sequence identical to the unpipelined executor; the
    # int matmuls are exact under any tiling, so only the float ops
    # contribute microbatch-tiling ulps
    q = model.quantize([x], bit_width=8)
    q_want = np.asarray(q([x])[0])
    q_stages = split_stages(q, S)
    assert all(getattr(sm, "quant_params", None) is not None
               for sm in q_stages)
    q_got = pipeline_forward(q_stages, mesh, x,
                             (q_want.shape, q_want.dtype),
                             n_microbatches=M)
    np.testing.assert_allclose(q_got, q_want, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(q_got.argmax(-1), q_want.argmax(-1))

    # ... and after optimize() (fused attention + int8_dataflow
    # planning): cut selection must avoid planned-int8 and
    # accumulator values
    q2 = model.quantize([x], bit_width=8)
    q2.optimize()
    q2_want = np.asarray(q2([x])[0])
    q2_got = pipeline_forward(split_stages(q2, 2), mesh2, x,
                              (q2_want.shape, q2_want.dtype),
                              n_microbatches=M)
    np.testing.assert_allclose(q2_got, q2_want, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(q2_got.argmax(-1), q2_want.argmax(-1))

@requires_8_devices
def test_pipeline_tp_composition_matches_single_device():
    """PP x TP: 2 pipeline stages over mesh ('pipe', 'model') = (2, 4)
    with tensor parallelism INSIDE each stage -- each stage is its own
    GSPMD TP program on a disjoint 4-device row, microbatch
    activations hop rows as async device transfers, and JAX's async
    dispatch overlaps the rows GPipe-style. (The one-shard_map-program
    form deadlocks: divergent switch branches carry different TP
    collectives -- see parallel/pipeline.py.) Microbatched prefill on
    the trained GPT: argmax-equal and ulp-close vs single device,
    with every stage's TP sharding actually placed."""
    from jax.sharding import PartitionSpec as P
    from numpy_quant_tpu.models import text_fixture as TF
    from numpy_quant_tpu.parallel.mesh import make_mesh
    from numpy_quant_tpu.parallel.pipeline import (
        pipeline_forward_stagewise, split_stages)

    B, M, S, TP = 8, 4, 2, 4
    proto = TF.trained_gpt_onnx(batch_size=B)
    model = nq.Model.from_onnx(proto)
    ids = TF.make_copy_batch(np.random.default_rng(9), B)
    x = np.take(proto._wte, ids, axis=0).astype(np.float32)
    want = np.asarray(model([x])[0])

    stages = split_stages(model, S)
    mesh = make_mesh(S * TP, axes=("pipe", "model"), shape=(S, TP))
    got = pipeline_forward_stagewise(stages, mesh, x, n_microbatches=M,
                                     rules=par.gpt_tp_rules)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))

    # stage weights really TP-shard over their own 4-device row
    for s, sm in enumerate(stages):
        assert tuple(sm.mesh.axis_names) == ("model",)
        placed = sm._placed_params()
        sharded = [n for n, a in placed.items()
                   if not isinstance(a, tuple)
                   and a.sharding.spec == P(None, "model")]
        assert sharded, f"stage {s} has no TP-sharded weights"
