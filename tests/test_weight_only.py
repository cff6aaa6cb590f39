"""Weight-only quantization (Model.quantize_weights): int8/int4 MatMul
weights with FLOAT compute -- the memory-bound serving mode. The only
numeric change is weight rounding, so outputs sit within the weight
quantization error of the float model; decode loops drive it
unchanged.
"""
import numpy as np
import pytest

import numpy_quant_tpu as nq
from numpy_quant_tpu.models.gpt import gpt_causal_lm, gpt_decode_step
from numpy_quant_tpu.tensor import PackedQTensor, QTensor
from numpy_quant_tpu.utils import generate, generate_kv

RNG = np.random.default_rng(61)


def test_w8_outputs_close_and_weights_int8():
    proto = gpt_causal_lm(batch_size=2, seq_len=12, seed=0)
    model = nq.Model.from_onnx(proto)
    embeds = RNG.normal(size=(2, 12, 32)).astype(np.float32)
    base = np.asarray(model([embeds])[0])

    n = model.quantize_weights(bit_width=8)
    assert n > 0
    qweights = [v for v in model.values
                if hasattr(v, "data") and isinstance(v.data, QTensor)]
    assert len(qweights) == n
    out = np.asarray(model([embeds])[0])
    # per-channel int8 weight rounding only: tight to float
    assert np.abs(out - base).mean() < 0.05
    assert not np.array_equal(out, base)  # the rounding is real


def test_w4_packs_and_stays_usable():
    proto = gpt_causal_lm(batch_size=2, seq_len=12, seed=0)
    model = nq.Model.from_onnx(proto)
    embeds = RNG.normal(size=(2, 12, 32)).astype(np.float32)
    base = np.asarray(model([embeds])[0])
    n = model.quantize_weights(bit_width=4)  # pack defaults on
    assert n > 0
    packed = [v for v in model.values
              if hasattr(v, "data") and isinstance(v.data, PackedQTensor)]
    assert len(packed) == n
    out = np.asarray(model([embeds])[0])
    assert np.isfinite(out).all()
    # int4 is coarser but the ranking should broadly hold
    agree = (out.argmax(-1) == base.argmax(-1)).mean()
    assert agree > 0.5


def test_weight_only_decode_loops():
    """generate / generate_kv run unchanged over a weight-only model,
    and greedy tokens stay close to the float decode."""
    proto = gpt_causal_lm(batch_size=2, seq_len=16, seed=0)
    model = nq.Model.from_onnx(proto)
    prompt = RNG.integers(0, 96, size=(2, 5)).astype(np.int32)
    f_seq = generate(model, prompt, proto._wte, max_new_tokens=6)
    model.quantize_weights(bit_width=8)
    w_seq = generate(model, prompt, proto._wte, max_new_tokens=6)
    assert (w_seq == f_seq).mean() >= 0.6

    step_proto = gpt_decode_step(batch_size=2, max_len=16, seed=0)
    step = nq.Model.from_onnx(step_proto)
    step.quantize_weights(bit_width=8)
    kv_seq = generate_kv(step, prompt, step_proto._wte, step_proto._wpe,
                         max_new_tokens=6)
    np.testing.assert_array_equal(kv_seq, w_seq)  # same rounded weights


def test_weight_only_rejects_qmodel():
    proto = gpt_causal_lm(batch_size=2, seq_len=12, seed=0)
    model = nq.Model.from_onnx(proto)
    embeds = RNG.normal(size=(2, 12, 32)).astype(np.float32)
    q = model.quantize([embeds], bit_width=8)
    with pytest.raises(ValueError, match="FLOAT-executor"):
        q.quantize_weights()


def test_w4_grouped_scales_beat_per_channel():
    """group_size scales (GPTQ/AWQ-style) recover int4 accuracy: the
    grouped-dequant weights sit strictly closer to the float weights
    than per-channel, and logits MSE drops accordingly."""
    proto = gpt_causal_lm(batch_size=2, seq_len=12, seed=0)
    embeds = RNG.normal(size=(2, 12, 32)).astype(np.float32)
    base_model = nq.Model.from_onnx(proto)
    base = np.asarray(base_model([embeds])[0])

    pc = nq.Model.from_onnx(gpt_causal_lm(batch_size=2, seq_len=12,
                                          seed=0))
    n_pc = pc.quantize_weights(bit_width=4, pack=False)
    gr = nq.Model.from_onnx(gpt_causal_lm(batch_size=2, seq_len=12,
                                          seed=0))
    n_gr = gr.quantize_weights(bit_width=4, pack=False, group_size=8)
    assert n_pc == n_gr > 0
    # grouped scales really stored compactly [K/8, N]
    gw = [v.data for v in gr.values
          if hasattr(v, "data") and isinstance(v.data, QTensor)
          and np.asarray(v.data.data).ndim == 2]
    assert any(np.asarray(w.scale).shape[0] > 1 for w in gw)

    mse_pc = float(np.mean((np.asarray(pc([embeds])[0]) - base) ** 2))
    mse_gr = float(np.mean((np.asarray(gr([embeds])[0]) - base) ** 2))
    assert mse_gr < mse_pc, (mse_gr, mse_pc)


def test_w4_grouped_packs():
    """Grouped scales survive the packed payload round trip."""
    proto = gpt_causal_lm(batch_size=2, seq_len=12, seed=0)
    model = nq.Model.from_onnx(proto)
    n = model.quantize_weights(bit_width=4, group_size=8)  # pack=True
    assert n > 0
    packed = [v.data for v in model.values
              if hasattr(v, "data") and isinstance(v.data, PackedQTensor)]
    assert packed and any(np.asarray(p.scale).shape[0] > 1
                          for p in packed)
    embeds = RNG.normal(size=(2, 12, 32)).astype(np.float32)
    out = np.asarray(model([embeds])[0])
    assert np.isfinite(out).all()

    # packed grouped == unpacked grouped (same ints, same scales)
    ref = nq.Model.from_onnx(gpt_causal_lm(batch_size=2, seq_len=12,
                                           seed=0))
    ref.quantize_weights(bit_width=4, pack=False, group_size=8)
    np.testing.assert_allclose(out, np.asarray(ref([embeds])[0]),
                               atol=1e-5)


def test_weight_only_gemm_mlp():
    """Gemm weights (the committed reference mlp.onnx uses Gemm with
    transB) convert too, with the channel axis following transB."""
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "numpy_quant_tpu", "models",
        "mlp.onnx")
    onnx_model = nq.onnx.load(path)
    nq.onnx.make_dim_param_fixed(onnx_model.graph, "batch_size", 8)
    model = nq.Model.from_onnx(onnx_model)
    x = RNG.normal(size=(8, 2)).astype(np.float32)
    base = np.asarray(model([x])[0])
    n = model.quantize_weights(bit_width=8, pack=False)
    assert n == 2  # both layer weights are Gemm rhs
    out = np.asarray(model([x])[0])
    assert np.abs(out - base).mean() < 0.05
    assert np.isfinite(out).all()


def test_weight_only_save_load_roundtrip(tmp_path):
    """save_weight_only/load_weight_only: bit-exact outputs after the
    round trip, grouped + packed payloads included."""
    from numpy_quant_tpu.utils import load_weight_only, save_weight_only

    proto = gpt_causal_lm(batch_size=2, seq_len=12, seed=0)
    model = nq.Model.from_onnx(proto)
    model.quantize_weights(bit_width=4, group_size=8)  # packed+grouped
    embeds = RNG.normal(size=(2, 12, 32)).astype(np.float32)
    base = np.asarray(model([embeds])[0])

    path = tmp_path / "wo.onnx"
    save_weight_only(model, str(path), proto)
    loaded = load_weight_only(str(path))
    out = np.asarray(loaded([embeds])[0])
    np.testing.assert_array_equal(out, base)
    # the payloads really persisted packed/grouped
    packed = [v.data for v in loaded.values
              if hasattr(v, "data") and isinstance(v.data, PackedQTensor)]
    assert packed and any(np.asarray(p.scale).shape[0] > 1
                          for p in packed)
