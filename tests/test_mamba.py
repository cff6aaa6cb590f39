"""Mamba-style selective SSM (models/mamba.py): causal depthwise conv
+ input-dependent state-space recurrence unrolled at the static length
-- verified against the live transformers module (reference test
strategy, SURVEY.md §4). First non-attention sequence domain.
"""
import numpy as np
import pytest

import numpy_quant_tpu as nq
from numpy_quant_tpu.models.mamba import mamba_causal_lm

RNG = np.random.default_rng(59)
B, L, H, V = 2, 8, 32, 96


@pytest.fixture(scope="module")
def mamba():
    m = mamba_causal_lm(batch_size=B, seq_len=L, seed=0)
    return m, nq.Model.from_onnx(m)


def test_mamba_logits_match_torch(mamba):
    import torch

    proto, model = mamba
    x = RNG.normal(size=(B, L, H)).astype(np.float32) * 0.3
    got = np.asarray(model([x])[0])
    with torch.no_grad():
        want = proto._torch_module(
            inputs_embeds=torch.from_numpy(x)).logits.numpy()
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_mamba_causality(mamba):
    """The conv+scan mixing is strictly causal: perturbing position j
    must not change logits < j."""
    proto, model = mamba
    x = RNG.normal(size=(B, L, H)).astype(np.float32) * 0.3
    base = np.asarray(model([x])[0])
    pert = x.copy()
    pert[:, 5:, :] += 1.0
    out = np.asarray(model([pert])[0])
    np.testing.assert_array_equal(out[:, :5], base[:, :5])
    assert not np.allclose(out[:, 5:], base[:, 5:])


def test_mamba_generate_matches_torch(mamba):
    """Greedy generation (full re-forward per token; the recurrence
    replaces the KV cache) matches torch token-by-token."""
    import torch

    from numpy_quant_tpu.utils import generate

    proto, model = mamba
    module = proto._torch_module
    prompt = RNG.integers(0, V, size=(B, 3)).astype(np.int32)

    ids = prompt.astype(np.int64)
    with torch.no_grad():
        for _ in range(4):
            logits = module(
                input_ids=torch.from_numpy(ids)).logits
            nxt = logits[:, -1, :].argmax(-1).numpy()
            ids = np.concatenate([ids, nxt[:, None]], axis=1)

    got = generate(model, prompt, proto._wte, max_new_tokens=4)
    np.testing.assert_array_equal(got, ids.astype(np.int32))


def test_mamba_int8_quantizes_projections(mamba):
    """int8 PTQ quantizes the in/x/dt/out projections + lm head while
    the recurrence stays float; argmax labels agree with float on the
    calibration batch."""
    proto, _ = mamba
    model = nq.Model.from_onnx(proto)
    x = RNG.normal(size=(B, L, H)).astype(np.float32) * 0.3
    y_ref = np.asarray(model([x])[0])
    q = model.quantize([x], bit_width=8)
    n_q = sum(1 for node in q.nodes if node.op in ("MatMul", "Gemm"))
    # 4 projections x 2 layers + L scan matmuls x 2 + head
    assert n_q == 4 * 2 + L * 2 + 1
    got = np.asarray(q([x])[0])
    assert (got.argmax(-1) == y_ref.argmax(-1)).mean() >= 0.9


def test_mamba_decode_step_matches_full_form(mamba):
    """The O(1)/token state-carry form (conv window + SSM state swapped
    wholesale per step) decodes the same greedy tokens as the full
    re-forward loop and torch."""
    import torch

    from numpy_quant_tpu.models.mamba import mamba_decode_step
    from numpy_quant_tpu.utils import generate_mamba

    proto, _ = mamba
    module = proto._torch_module
    step_proto = mamba_decode_step(batch_size=B, module=module)
    step = nq.Model.from_onnx(step_proto)
    prompt = RNG.integers(0, V, size=(B, 3)).astype(np.int32)

    ids = prompt.astype(np.int64)
    with torch.no_grad():
        for _ in range(4):
            logits = module(input_ids=torch.from_numpy(ids)).logits
            nxt = logits[:, -1, :].argmax(-1).numpy()
            ids = np.concatenate([ids, nxt[:, None]], axis=1)

    got = generate_mamba(step, prompt, step_proto._wte, max_new_tokens=4)
    np.testing.assert_array_equal(got, ids.astype(np.int32))


def test_mamba_decode_step_quantized(mamba):
    """int8 PTQ of the SSM step graph via mamba_decode_calibration; the
    quantized loop still emits the prompt prefix and mostly agrees with
    the float loop."""
    from numpy_quant_tpu.models.mamba import mamba_decode_step
    from numpy_quant_tpu.utils import (generate_mamba,
                                       mamba_decode_calibration,
                                       merge_calibration_stats)

    proto, _ = mamba
    step_proto = mamba_decode_step(batch_size=B,
                                   module=proto._torch_module)
    step = nq.Model.from_onnx(step_proto)
    prompt = np.concatenate(
        [RNG.integers(0, V, size=(B, 3)).astype(np.int32)], axis=1)

    f_seq = generate_mamba(step, prompt, step_proto._wte,
                           max_new_tokens=4)
    batches = mamba_decode_calibration(step, prompt, step_proto._wte)
    stats = merge_calibration_stats(
        *[step.calibration_stats(bt) for bt in batches])
    qstep = step.quantize(stats=stats, bit_width=8)
    q_seq = generate_mamba(qstep, prompt, step_proto._wte,
                           max_new_tokens=4)
    assert q_seq.shape == f_seq.shape
    np.testing.assert_array_equal(q_seq[:, :3], prompt)
    assert (q_seq == f_seq).mean() >= 0.6
