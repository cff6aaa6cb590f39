"""DecodeAttention fusion (passes/decode_attention.py): the KV-cache
step graph's score/softmax/context chain as ONE node.

Parity contract: float models and greedy tokens are EXACT; quantized
forwards are ulp-equal (the fused op replays every quantize the
unfused executor applies -- fake-quant of q/probs with the same
calibrated params -- but runs the M=1 dots in f32 instead of exact
integer + zero-point-correction sums, which is the point: the
correction sums re-reduce the whole cache every step). See the pass
docstring for the measured numbers.
"""
import numpy as np
import pytest

import numpy_quant_tpu as nq
from numpy_quant_tpu.utils import (decode_calibration, generate_kv,
                                   merge_calibration_stats)

RNG = np.random.default_rng(7)


def _stats_for(proto, prompt):
    fcal = nq.Model.from_onnx(proto)
    batches = decode_calibration(fcal, prompt, proto._wte, proto._wpe)
    return merge_calibration_stats(
        *[fcal.calibration_stats(b) for b in batches])


def test_gpt_decode_attention_float_and_quantized():
    from numpy_quant_tpu.models.gpt import gpt_decode_step

    proto = gpt_decode_step(batch_size=3, max_len=12, seed=0)
    prompt = RNG.integers(0, 96, size=(3, 5)).astype(np.int32)

    base = nq.Model.from_onnx(proto)
    want = generate_kv(base, prompt, proto._wte, proto._wpe, 6)
    fused = nq.Model.from_onnx(proto)
    assert fused.fuse_decode_attention() == 2
    assert sum(1 for n in fused.nodes if n.op == "DecodeAttention") == 2
    assert not any(n.op == "Softmax" for n in fused.nodes)
    np.testing.assert_array_equal(
        generate_kv(fused, prompt, proto._wte, proto._wpe, 6), want)

    # quantized: optimize() includes the pass; tokens equal, forwards
    # ulp-equal, int8 KV cache flows straight into the fused op
    stats = _stats_for(proto, prompt[:, :3])
    q1 = nq.Model.from_onnx(proto).quantize(stats=stats, bit_width=8)
    q2 = nq.Model.from_onnx(proto).quantize(stats=stats, bit_width=8)
    rep = q2.optimize()
    assert rep["fuse_decode_attention"] == 2
    x = RNG.normal(size=(3, 1, 32)).astype(np.float32)
    mask = np.zeros((1, 1, 1, 13), np.float32)
    caches = [RNG.normal(size=(3, 2, 12, 16)).astype(np.float32) * 0.1
              for _ in range(4)]
    o1 = np.asarray(q1([x, mask] + caches)[0])
    o2 = np.asarray(q2([x, mask] + caches)[0])
    np.testing.assert_allclose(o2, o1, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(
        generate_kv(q2, prompt, proto._wte, proto._wpe, 6),
        generate_kv(q1, prompt, proto._wte, proto._wpe, 6))
    np.testing.assert_array_equal(
        generate_kv(q2, prompt, proto._wte, proto._wpe, 6,
                    kv_cache_dtype="int8"),
        generate_kv(q1, prompt, proto._wte, proto._wpe, 6,
                    kv_cache_dtype="int8"))


def test_llama_decode_attention_rope_gqa():
    """RoPE + grouped-query cache repeat upstream of qh/kh: the
    pattern matches from the Softmax downward, so the rotary and
    repeat structure is untouched."""
    from numpy_quant_tpu.models.llama import llama_decode_step

    proto = llama_decode_step(batch_size=2, max_len=10, seed=1)
    prompt = RNG.integers(0, 64, size=(2, 4)).astype(np.int32)
    rope = proto._rope_tables

    base = nq.Model.from_onnx(proto)
    want = generate_kv(base, prompt, proto._wte, None, 5, rope=rope)
    fused = nq.Model.from_onnx(proto)
    assert fused.fuse_decode_attention() > 0
    np.testing.assert_array_equal(
        generate_kv(fused, prompt, proto._wte, None, 5, rope=rope),
        want)


def test_t5_decode_attention_score_bias():
    """T5: no scale Mul, TWO Adds (mask + relative-position bias) in
    the epilogue chain; both ride as fused-node inputs."""
    from numpy_quant_tpu.models.t5 import t5_decode_step

    proto = t5_decode_step(batch_size=2, max_len=10, src_len=6, seed=2)
    prompt = RNG.integers(0, 48, size=(2, 4)).astype(np.int32)
    d = int(proto._torch_module.config.d_model)
    memory = RNG.normal(size=(2, 6, d)).astype(np.float32) * 0.3

    base = nq.Model.from_onnx(proto)
    fused = nq.Model.from_onnx(proto)
    n = fused.fuse_decode_attention()
    assert n > 0
    kw = {"score_bias": proto._decode_bias, "memory": memory}
    want = generate_kv(base, prompt, proto._wte, None, 5, **kw)
    np.testing.assert_array_equal(
        generate_kv(fused, prompt, proto._wte, None, 5, **kw), want)


def test_trained_fixture_decode_attention_tokens_exact():
    """The trained copy-language GPT decodes identical tokens (and
    solves its task) through the fused decode attention, full int8 +
    int8 KV cache included."""
    from numpy_quant_tpu.models import text_fixture as TF

    B = 4
    rng = np.random.default_rng(3)
    prompts, expected = TF.make_prompts(rng, B)
    prompts = prompts.astype(np.int32)
    proto = TF.trained_gpt_decode_onnx(batch_size=B)

    base = nq.Model.from_onnx(proto)
    want = generate_kv(base, prompts, proto._wte, proto._wpe,
                       TF.COPY_LEN)
    assert TF.copy_accuracy(want[:, TF.COPY_LEN + 1:], expected) == 1.0

    stats = _stats_for(proto, prompts[:, :6])
    q1 = nq.Model.from_onnx(proto).quantize(stats=stats, bit_width=8)
    q2 = nq.Model.from_onnx(proto).quantize(stats=stats, bit_width=8)
    assert q2.optimize()["fuse_decode_attention"] > 0
    s1 = generate_kv(q1, prompts, proto._wte, proto._wpe, TF.COPY_LEN,
                     kv_cache_dtype="int8")
    s2 = generate_kv(q2, prompts, proto._wte, proto._wpe, TF.COPY_LEN,
                     kv_cache_dtype="int8")
    np.testing.assert_array_equal(s2, s1)
    assert TF.copy_accuracy(s2[:, TF.COPY_LEN + 1:], expected) == 1.0


def test_continuous_batcher_with_fused_decode_attention():
    """ContinuousBatcher over a fused step model: same per-request
    rows as the unfused engine."""
    from numpy_quant_tpu.models.gpt import gpt_decode_step
    from numpy_quant_tpu.utils import ContinuousBatcher

    proto = gpt_decode_step(batch_size=3, max_len=12, seed=0)
    workload = [(RNG.integers(0, 96, size=(1 + i % 3,)).astype(np.int32),
                 4) for i in range(5)]
    base = nq.Model.from_onnx(proto)
    want = ContinuousBatcher(base, proto._wte, proto._wpe).run(workload)
    fused = nq.Model.from_onnx(proto)
    fused.fuse_decode_attention()
    got = ContinuousBatcher(fused, proto._wte, proto._wpe).run(workload)
    for rid in want:
        np.testing.assert_array_equal(got[rid], want[rid])
