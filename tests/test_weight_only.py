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
