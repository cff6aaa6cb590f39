"""GPT causal decoder (models/gpt.py) + one-program generation
(utils/generate.py): graph parity against the live transformers module,
greedy decode parity against a token-by-token torch loop, and the
quantized paths driving the same loop.
"""
import numpy as np
import pytest

import numpy_quant_tpu as nq
from numpy_quant_tpu.models.gpt import gpt_causal_lm, gpt_decode_step
from numpy_quant_tpu.utils import (decode_calibration, generate,
                                   generate_kv, merge_calibration_stats)

RNG = np.random.default_rng(29)


@pytest.fixture(scope="module")
def gpt():
    m = gpt_causal_lm(batch_size=2, seq_len=16, seed=0)
    return m, nq.Model.from_onnx(m)


def _torch_logits(module, embeds):
    import torch

    with torch.no_grad():
        return module(inputs_embeds=torch.from_numpy(embeds)).logits.numpy()


def test_gpt_logits_match_torch(gpt):
    proto, model = gpt
    embeds = RNG.normal(size=(2, 16, 32)).astype(np.float32)
    got = model([embeds])[0]
    want = _torch_logits(proto._torch_module, embeds)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_gpt_causality(gpt):
    """Perturbing position j must not change logits at positions < j."""
    proto, model = gpt
    embeds = RNG.normal(size=(2, 16, 32)).astype(np.float32)
    base = model([embeds])[0]
    pert = embeds.copy()
    pert[:, 9:, :] += 1.0
    out = model([pert])[0]
    np.testing.assert_array_equal(out[:, :9], base[:, :9])
    assert not np.allclose(out[:, 9:], base[:, 9:])


def _torch_greedy(module, wte, prompt, n_new):
    """Token-by-token full re-forward greedy loop (the oracle)."""
    import torch

    ids = prompt.copy()
    for _ in range(n_new):
        with torch.no_grad():
            logits = module(
                input_ids=torch.from_numpy(ids.astype(np.int64))).logits
        nxt = logits[:, -1, :].argmax(-1).numpy().astype(prompt.dtype)
        ids = np.concatenate([ids, nxt[:, None]], axis=1)
    return ids


def test_generate_greedy_matches_torch(gpt):
    proto, model = gpt
    prompt = RNG.integers(0, 96, size=(2, 5)).astype(np.int32)
    want = _torch_greedy(proto._torch_module, proto._wte, prompt, 8)
    got = generate(model, prompt, proto._wte, max_new_tokens=8)
    np.testing.assert_array_equal(got, want)


def test_generate_bounds_and_sampling(gpt):
    proto, model = gpt
    prompt = RNG.integers(0, 96, size=(2, 4)).astype(np.int32)
    with pytest.raises(ValueError):
        generate(model, prompt, proto._wte, max_new_tokens=13)

    import jax

    s1 = generate(model, prompt, proto._wte, max_new_tokens=6,
                  temperature=0.8, key=jax.random.PRNGKey(7))
    s2 = generate(model, prompt, proto._wte, max_new_tokens=6,
                  temperature=0.8, key=jax.random.PRNGKey(7))
    np.testing.assert_array_equal(s1, s2)  # same key -> same sample
    assert s1.shape == (2, 10) and (s1 >= 0).all() and (s1 < 96).all()
    np.testing.assert_array_equal(s1[:, :4], prompt)

    # top-k=1 is greedy whatever the temperature; top-p runs and stays
    # deterministic under a fixed key
    greedy = generate(model, prompt, proto._wte, max_new_tokens=6)
    k1 = generate(model, prompt, proto._wte, max_new_tokens=6,
                  temperature=5.0, top_k=1, key=jax.random.PRNGKey(3))
    np.testing.assert_array_equal(k1, greedy)
    p1 = generate(model, prompt, proto._wte, max_new_tokens=6,
                  temperature=0.8, top_p=0.9, key=jax.random.PRNGKey(5))
    p2 = generate(model, prompt, proto._wte, max_new_tokens=6,
                  temperature=0.8, top_p=0.9, key=jax.random.PRNGKey(5))
    np.testing.assert_array_equal(p1, p2)
    assert (p1[:, 4:] < 96).all()


def test_causal_attention_fuses_bit_identical(gpt):
    """fuse_attention matches the decoder idiom (Mul -> Add(triangular
    mask) -> Softmax): both layers fuse into FusedAttentionHS with the
    dequantized mask value applied in-kernel, bit-identically -- and
    generation through the fused executor returns the same tokens."""
    proto, model = gpt
    embeds = RNG.normal(size=(2, 16, 32)).astype(np.float32)
    q = model.quantize([embeds], bit_width=8)
    base = q([embeds])[0]
    prompt = RNG.integers(0, 96, size=(2, 5)).astype(np.int32)
    seq = generate(q, prompt, proto._wte, max_new_tokens=6)

    rep = q.optimize()
    assert rep["fuse_attention"] == 2, rep
    assert rep["fusion_failures"] == []
    fnodes = [n for n in q.nodes if n.op == "FusedAttentionHS"]
    assert len(fnodes) == 2
    assert all(n.attrs["causal_mask_val"] < -1e4 for n in fnodes)

    np.testing.assert_array_equal(q([embeds])[0], base)
    np.testing.assert_array_equal(
        generate(q, prompt, proto._wte, max_new_tokens=6), seq)


def test_decode_step_matches_full_form(gpt):
    """The KV-cache step graph (O(L)/token) decodes the exact same
    greedy sequence as the full-sequence graph and the torch loop --
    same seed builds the same module, so weights are shared."""
    proto, _ = gpt
    step_proto = gpt_decode_step(batch_size=2, max_len=16, seed=0)
    step = nq.Model.from_onnx(step_proto)

    prompt = RNG.integers(0, 96, size=(2, 5)).astype(np.int32)
    want = _torch_greedy(proto._torch_module, proto._wte, prompt, 8)
    got = generate_kv(step, prompt, step_proto._wte, step_proto._wpe,
                      max_new_tokens=8)
    np.testing.assert_array_equal(got, want)

    with pytest.raises(ValueError):
        generate_kv(step, prompt, step_proto._wte, step_proto._wpe,
                    max_new_tokens=14)


def test_decode_step_quantized(gpt):
    """int8 decode: calibrate the step graph by replaying a prompt
    (per-step stats merged), then drive the same one-program loop."""
    step_proto = gpt_decode_step(batch_size=2, max_len=16, seed=0)
    step = nq.Model.from_onnx(step_proto)
    wte, wpe = step_proto._wte, step_proto._wpe

    prompt = RNG.integers(0, 96, size=(2, 8)).astype(np.int32)
    f_seq = generate_kv(step, prompt, wte, wpe, max_new_tokens=6)

    batches = decode_calibration(step, prompt, wte, wpe)
    stats = merge_calibration_stats(
        *[step.calibration_stats(b) for b in batches])
    qstep = step.quantize(stats=stats, bit_width=8)
    q_seq = generate_kv(qstep, prompt, wte, wpe, max_new_tokens=6)
    assert q_seq.shape == f_seq.shape
    np.testing.assert_array_equal(q_seq[:, :8], prompt)
    assert (q_seq == f_seq).mean() >= 0.6

    # int8 KV cache: 4x less cache HBM, bit-identical tokens (the carry
    # stores exactly what the executor's on-entry quantize produces)
    q8_seq = generate_kv(qstep, prompt, wte, wpe, max_new_tokens=6,
                         kv_cache_dtype="int8")
    np.testing.assert_array_equal(q8_seq, q_seq)
    with pytest.raises(ValueError):
        generate_kv(step, prompt, wte, wpe, max_new_tokens=6,
                    kv_cache_dtype="int8")  # float model has no qparams


def test_generate_benchmark_tiny_smoke():
    """extras/generate_benchmark.py --tiny stays runnable (the TPU
    bench path compiles and reports all variants)."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "extras",
                                      "generate_benchmark.py"), "--tiny"],
        capture_output=True, text=True, timeout=600, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    recs = [json.loads(ln) for ln in r.stdout.splitlines()
            if ln.startswith("{")]
    assert len(recs) == 11  # incl. the steps_per_sync=8 engine row
    assert all(rec["tokens_per_sec"] > 0 for rec in recs)


def test_generate_quantized_paths(gpt):
    """int8 PTQ and dynamic quantization both drive the same decode
    loop; random-weights logits make exact token parity too brittle to
    pin, so assert high agreement with the float decode."""
    proto, model = gpt
    prompt = RNG.integers(0, 96, size=(2, 5)).astype(np.int32)
    f_seq = generate(model, prompt, proto._wte, max_new_tokens=8)

    calib = np.take(proto._wte, RNG.integers(0, 96, size=(2, 16)), axis=0)
    q = model.quantize([calib.astype(np.float32)], bit_width=8)
    q_seq = generate(q, prompt, proto._wte, max_new_tokens=8)
    assert q_seq.shape == f_seq.shape
    assert (q_seq == f_seq).mean() >= 0.6

    dyn = model.quantize_dynamic()
    d_seq = generate(dyn, prompt, proto._wte, max_new_tokens=8)
    assert (d_seq == f_seq).mean() >= 0.6


def test_generate_min_p_and_repetition_penalty(gpt):
    """min_p=1.0 keeps only the mode (greedy whatever the temperature);
    a strong repetition penalty composes with greedy decode and changes
    a repetitive continuation; both knobs work through the KV step form
    identically."""
    import jax

    from numpy_quant_tpu.models.gpt import gpt_decode_step
    from numpy_quant_tpu.utils import generate_kv

    proto, model = gpt
    prompt = RNG.integers(0, 96, size=(2, 4)).astype(np.int32)

    greedy = generate(model, prompt, proto._wte, max_new_tokens=6)
    m1 = generate(model, prompt, proto._wte, max_new_tokens=6,
                  temperature=5.0, min_p=1.0, key=jax.random.PRNGKey(3))
    np.testing.assert_array_equal(m1, greedy)

    # tiny random GPTs repeat greedily; a strong penalty must break
    # at least one repetition without touching the prompt
    rep = generate(model, prompt, proto._wte, max_new_tokens=6,
                   repetition_penalty=1e9)
    np.testing.assert_array_equal(rep[:, :4], prompt)
    gen = rep[:, 4:]
    for b in range(2):
        assert len(set(gen[b].tolist())) == 6, gen[b]
    assert not np.array_equal(rep, greedy)

    # the KV step form applies the same penalty rule -> same tokens
    step_proto = gpt_decode_step(batch_size=2, max_len=12,
                                 module=proto._torch_module)
    step = nq.Model.from_onnx(step_proto)
    rep_kv = generate_kv(step, prompt, proto._wte, proto._wpe,
                         max_new_tokens=6, repetition_penalty=1e9)
    np.testing.assert_array_equal(rep_kv, rep)
