"""Long-running: TASK-level decode accuracy capstone on the TRAINED
copy-language GPT fixture (models/text_fixture.py).

The reference demands task-level oracles of its quantization path (MLP
accuracy across bit widths, reference test/test_mlp.py:177-186; real-ViT
label equality, test/long_running/test_vit.py:167). The vision side has
trained fixtures; this file gives the SERVING surface the same: every
deployment quantization config -- W8 weight-only, W4-grouped+AWQ, GPTQ,
int8 PTQ, int8 KV cache, continuous batching with paged KV -- must
decode a WORKING language model correctly, asserted as token equality
against the float decode plus a floor on the task metric (copy
accuracy).

Enabled with NQ_RUN_SLOW=1 (each config compiles its own decode
program).
"""
import os

import numpy as np
import pytest

import numpy_quant_tpu as nq
from numpy_quant_tpu.models import text_fixture as TF
from numpy_quant_tpu.utils import ContinuousBatcher, generate, generate_kv

slow = pytest.mark.skipif(
    os.environ.get("NQ_RUN_SLOW") != "1",
    reason="set NQ_RUN_SLOW=1 to run the trained-decode capstone")

BATCH = 8
# greedy float decode of the trained fixture must essentially solve the
# copy task; measured 1.000 at training time (text_fixture.train_fixture)
FLOAT_ACC_FLOOR = 0.97
# low-bit weight configs may flip an occasional token where the float
# model was itself near-undecided; the task metric may not degrade
# by more than this
MAX_ACC_DROP = 0.02


@pytest.fixture(scope="module")
def fixture_data():
    rng = np.random.default_rng(11)
    prompts, expected = TF.make_prompts(rng, BATCH)
    return prompts.astype(np.int32), expected


@pytest.fixture(scope="module")
def full_setup(fixture_data):
    """Float full-sequence model + its greedy decode (the oracle)."""
    prompts, expected = fixture_data
    proto = TF.trained_gpt_onnx(batch_size=BATCH)
    model = nq.Model.from_onnx(proto)
    f_seq = generate(model, prompts, proto._wte,
                     max_new_tokens=TF.COPY_LEN)
    acc = TF.copy_accuracy(f_seq[:, TF.COPY_LEN + 1:], expected)
    assert acc >= FLOAT_ACC_FLOOR, f"float copy accuracy {acc}"
    return proto, prompts, expected, f_seq, acc


@pytest.fixture(scope="module")
def step_setup(fixture_data):
    """Float decode-step model + its greedy KV decode."""
    prompts, expected = fixture_data
    proto = TF.trained_gpt_decode_onnx(batch_size=BATCH)
    model = nq.Model.from_onnx(proto)
    f_seq = generate_kv(model, prompts, proto._wte, proto._wpe,
                        max_new_tokens=TF.COPY_LEN)
    acc = TF.copy_accuracy(f_seq[:, TF.COPY_LEN + 1:], expected)
    assert acc >= FLOAT_ACC_FLOOR, f"float KV copy accuracy {acc}"
    return proto, prompts, expected, f_seq, acc


def _assert_config_ok(seq, f_seq, expected, f_acc, name,
                      require_equal=True):
    """Token equality vs the float decode (strict for >=8-bit configs,
    tight accuracy bound otherwise)."""
    acc = TF.copy_accuracy(seq[:, TF.COPY_LEN + 1:], expected)
    print(f"{name}: copy accuracy {acc:.4f} (float {f_acc:.4f})")
    if require_equal:
        np.testing.assert_array_equal(
            seq, f_seq, err_msg=f"{name}: tokens diverged from float")
    assert acc >= f_acc - MAX_ACC_DROP, (name, acc, f_acc)


@slow
def test_float_task_accuracy(full_setup):
    """The committed fixture actually solves its language (the
    precondition that makes every other assert meaningful)."""
    _, _, _, _, acc = full_setup
    assert acc >= FLOAT_ACC_FLOOR


@slow
def test_w8_weight_only_token_equality(full_setup):
    proto, prompts, expected, f_seq, f_acc = full_setup
    m = nq.Model.from_onnx(proto)
    assert m.quantize_weights(bit_width=8) > 0
    seq = generate(m, prompts, proto._wte, max_new_tokens=TF.COPY_LEN)
    _assert_config_ok(seq, f_seq, expected, f_acc, "w8-weight-only")


@slow
def test_w4_grouped_awq_accuracy(full_setup):
    proto, prompts, expected, f_seq, f_acc = full_setup
    m = nq.Model.from_onnx(proto)
    # AWQ scale search on full-length calibration embeddings (the full
    # graph's input signature), then grouped W4
    ids = TF.make_copy_batch(np.random.default_rng(3), BATCH)
    calib = np.take(proto._wte, ids, axis=0).astype(np.float32)
    m.awq_scale_weights([calib], bit_width=4, group_size=32)
    assert m.quantize_weights(bit_width=4, group_size=32) > 0
    seq = generate(m, prompts, proto._wte, max_new_tokens=TF.COPY_LEN)
    _assert_config_ok(seq, f_seq, expected, f_acc, "w4-grouped-awq",
                      require_equal=False)


@slow
def test_int8_ptq_and_gptq_accuracy(full_setup):
    proto, prompts, expected, f_seq, f_acc = full_setup
    m = nq.Model.from_onnx(proto)
    ids = TF.make_copy_batch(np.random.default_rng(3), BATCH)
    calib = np.take(proto._wte, ids, axis=0).astype(np.float32)
    q = m.quantize([calib], bit_width=8)
    q.optimize()
    seq = generate(q, prompts, proto._wte, max_new_tokens=TF.COPY_LEN)
    _assert_config_ok(seq, f_seq, expected, f_acc, "int8-ptq",
                      require_equal=False)
    # GPTQ refinement on top of the same PTQ model must not hurt
    q2 = nq.Model.from_onnx(proto).quantize([calib], bit_width=8)
    assert q2.gptq(m, [calib]) > 0
    seq2 = generate(q2, prompts, proto._wte, max_new_tokens=TF.COPY_LEN)
    _assert_config_ok(seq2, f_seq, expected, f_acc, "int8-gptq",
                      require_equal=False)


@slow
def test_int8_kv_cache_accuracy(step_setup):
    proto, prompts, expected, f_seq, f_acc = step_setup
    from numpy_quant_tpu.utils import (decode_calibration,
                                       merge_calibration_stats)
    m = nq.Model.from_onnx(proto)
    batches = decode_calibration(m, prompts, proto._wte, proto._wpe)
    stats = merge_calibration_stats(
        *[m.calibration_stats(b) for b in batches])
    q = m.quantize(stats=stats, bit_width=8)
    seq_f = generate_kv(q, prompts, proto._wte, proto._wpe,
                        max_new_tokens=TF.COPY_LEN)
    _assert_config_ok(seq_f, f_seq, expected, f_acc, "int8-kv-float-carry",
                      require_equal=False)
    seq_i8 = generate_kv(q, prompts, proto._wte, proto._wpe,
                         max_new_tokens=TF.COPY_LEN,
                         kv_cache_dtype="int8")
    # int8 cache carries are bit-identical to the float carries of the
    # SAME quantized model (quantize is idempotent)
    np.testing.assert_array_equal(seq_i8, seq_f)
    _assert_config_ok(seq_i8, f_seq, expected, f_acc, "int8-kv-int8-cache",
                      require_equal=False)


@slow
def test_continuous_batching_paged_kv_accuracy(step_setup):
    """The serving engine (2x oversubscribed, paged KV, prefill
    admission) decodes the trained language correctly: every request's
    tokens equal the lockstep generate_kv result, and the task metric
    holds."""
    proto, prompts, expected, f_seq, f_acc = step_setup
    model = nq.Model.from_onnx(proto)
    pre = nq.Model.from_onnx(
        TF.trained_gpt_prefill_onnx(prefill_len=TF.COPY_LEN + 1))
    cb = ContinuousBatcher(model, proto._wte, proto._wpe,
                           prefill_model=pre,
                           paged_kv=(4, 2 * BATCH * 6 + 1))
    workload = [(prompts[i], TF.COPY_LEN) for i in range(BATCH)] * 2
    results = cb.run(workload)  # {req_id: tokens}, ids in submit order
    assert len(results) == 2 * BATCH
    accs = []
    for i in sorted(results):
        seq = np.asarray(results[i])
        np.testing.assert_array_equal(
            seq[:f_seq.shape[1]], f_seq[i % BATCH],
            err_msg=f"request {i}: engine tokens diverged from "
                    "lockstep float decode")
        accs.append(TF.copy_accuracy(
            seq[None, TF.COPY_LEN + 1:], expected[i % BATCH]))
    acc = float(np.mean(accs))
    print(f"continuous-batching+paged-kv: copy accuracy {acc:.4f}")
    assert acc >= f_acc - MAX_ACC_DROP


@slow
def test_low_bit_scale_granularity_ladder(full_setup):
    """TASK-level demonstration that scale granularity carries accuracy
    at low bit widths (the reference's bit-width-sweep philosophy,
    reference test/test_mlp.py:177-186, on a trained language model):
    per-TENSOR weight scales degrade at W3 and DESTROY the model at W2
    (measured 0.958 / 0.000 copy accuracy), while per-channel and
    grouped scales hold 1.000 at both -- the quantitative case for the
    parity-plus granularity features."""
    proto, prompts, expected, _, f_acc = full_setup

    def acc_of(model):
        seq = generate(model, prompts, proto._wte,
                       max_new_tokens=TF.COPY_LEN)
        return TF.copy_accuracy(seq[:, TF.COPY_LEN + 1:], expected)

    results = {}
    for bits in (3, 2):
        pt = nq.Model.from_onnx(proto)
        pt.quantize_weights(bit_width=bits, per_channel=False)
        pc = nq.Model.from_onnx(proto)
        pc.quantize_weights(bit_width=bits, per_channel=True)
        gr = nq.Model.from_onnx(proto)
        gr.quantize_weights(bit_width=bits, group_size=32)
        results[bits] = (acc_of(pt), acc_of(pc), acc_of(gr))
        print(f"W{bits}: per-tensor {results[bits][0]:.3f}  "
              f"per-channel {results[bits][1]:.3f}  "
              f"grouped {results[bits][2]:.3f}")
    # W2 per-tensor must collapse; finer granularities must hold
    assert results[2][0] <= 0.5, results
    assert results[2][1] >= f_acc - 0.05, results
    assert results[2][2] >= f_acc - 0.05, results
    # W3: granularity strictly helps (per-tensor already lossy)
    assert results[3][0] <= results[3][1] + 1e-9, results
    assert results[3][1] >= f_acc - 0.05, results
