"""Paged KV cache (``ContinuousBatcher(paged_kv=(block_size,
n_blocks))``): all slots share one block pool per layer plus per-slot
block tables (the vLLM memory model, here as one compiled XLA step:
table-gather -> attention -> block-scatter). Oracle: every completed
request must be token-exact with generate_kv run alone -- and with the
dense-cache engine -- no matter how blocks were allocated, reused after
retirement, or preempted-and-recomputed mid-decode.
"""
import numpy as np
import pytest

import numpy_quant_tpu as nq
from numpy_quant_tpu.models.gpt import gpt_decode_step
from numpy_quant_tpu.utils import generate_kv
from numpy_quant_tpu.utils.serving import ContinuousBatcher

RNG = np.random.default_rng(83)
MAXLEN = 12


@pytest.fixture(scope="module")
def gpt_steps():
    proto = gpt_decode_step(batch_size=3, max_len=MAXLEN, seed=0)
    module = proto._torch_module
    engine = nq.Model.from_onnx(proto)
    oracle_proto = gpt_decode_step(batch_size=1, max_len=MAXLEN,
                                   module=module)
    oracle = nq.Model.from_onnx(oracle_proto)
    return engine, oracle, proto


def _oracle_row(oracle, proto, prompt, n_new):
    return generate_kv(oracle, prompt[None, :], proto._wte, proto._wpe,
                       max_new_tokens=n_new)[0]


def test_paged_matches_dense_and_oracle(gpt_steps):
    """Ragged workload through a roomy pool: token-exact with both the
    dense engine and the solo generate_kv runs."""
    engine, oracle, proto = gpt_steps
    reqs = [(RNG.integers(0, 96, size=(k,)).astype(np.int32), n)
            for k, n in [(1, 6), (3, 4), (2, 8), (5, 3), (4, 5)]]
    paged = ContinuousBatcher(engine, proto._wte, proto._wpe,
                              paged_kv=(4, 10))
    dense = ContinuousBatcher(engine, proto._wte, proto._wpe)
    got_p, got_d = paged.run(list(reqs)), dense.run(list(reqs))
    assert len(got_p) == 5
    for rid, (prompt, n_new) in enumerate(reqs):
        want = _oracle_row(oracle, proto, prompt, n_new)
        np.testing.assert_array_equal(got_p[rid], want, err_msg=f"req {rid}")
        np.testing.assert_array_equal(got_d[rid], want)
    assert paged.stats["preemptions"] == 0
    # every block returned to the free list at drain
    assert sorted(paged._free, reverse=True) == list(range(9, 0, -1))
    assert all(not o for o in paged._owned)


def test_pool_smaller_than_dense_capacity(gpt_steps):
    """The capacity win: 3 slots x L=12 dense would hold 36 rows; a
    9-block x size-2 pool holds 18, yet short ragged requests still
    serve exactly because blocks track ACTUAL lengths."""
    engine, oracle, proto = gpt_steps
    b = ContinuousBatcher(engine, proto._wte, proto._wpe,
                          paged_kv=(2, 10))
    reqs = [(RNG.integers(0, 96, size=(k,)).astype(np.int32), n)
            for k, n in [(2, 3), (1, 4), (3, 2), (2, 4), (1, 3), (4, 2)]]
    got = b.run(reqs)
    assert len(got) == 6
    for rid, (prompt, n_new) in enumerate(reqs):
        want = _oracle_row(oracle, proto, prompt, n_new)
        np.testing.assert_array_equal(got[rid], want, err_msg=f"req {rid}")


def test_preemption_by_recompute(gpt_steps):
    """A pool too small for three concurrent full-length requests
    forces mid-decode preemption; the preempted request replays its
    tokens-so-far and still finishes token-exact (greedy)."""
    engine, oracle, proto = gpt_steps
    # each request needs ceil((2+9-1)/2)=5 blocks; 3 concurrent need 15
    # but the pool allots 8 -> the youngest gets preempted mid-decode
    b = ContinuousBatcher(engine, proto._wte, proto._wpe,
                          paged_kv=(2, 9))
    reqs = [(RNG.integers(0, 96, size=(2,)).astype(np.int32), 9)
            for _ in range(3)]
    got = b.run(reqs)
    assert b.stats["preemptions"] >= 1
    for rid, (prompt, n_new) in enumerate(reqs):
        want = _oracle_row(oracle, proto, prompt, n_new)
        np.testing.assert_array_equal(got[rid], want, err_msg=f"req {rid}")


def test_paged_int8_cache(gpt_steps):
    """int8 block pools on a quantized step model: bit-identical to the
    float-pool paged run."""
    from numpy_quant_tpu.utils import (decode_calibration,
                                       merge_calibration_stats)

    engine, _, proto = gpt_steps
    prompts = RNG.integers(0, 96, size=(3, 4)).astype(np.int32)
    batches = decode_calibration(engine, prompts, proto._wte, proto._wpe)
    stats = merge_calibration_stats(
        *[engine.calibration_stats(x) for x in batches])
    qengine = engine.quantize(stats=stats, bit_width=8)

    reqs = [(RNG.integers(0, 96, size=(k,)).astype(np.int32), n)
            for k, n in [(2, 5), (4, 3), (1, 6)]]
    got_f = ContinuousBatcher(qengine, proto._wte, proto._wpe,
                              paged_kv=(4, 10)).run(list(reqs))
    got_8 = ContinuousBatcher(qengine, proto._wte, proto._wpe,
                              paged_kv=(4, 10),
                              kv_cache_dtype="int8").run(list(reqs))
    for rid in got_f:
        np.testing.assert_array_equal(got_8[rid], got_f[rid])


def test_paged_rope_layout():
    """Per-row RoPE rows compose with block tables (LLaMA layout)."""
    from numpy_quant_tpu.models.llama import llama_decode_step

    proto = llama_decode_step(batch_size=2, max_len=10, seed=0)
    module = proto._torch_module
    engine = nq.Model.from_onnx(proto)
    oracle_proto = llama_decode_step(batch_size=1, max_len=10,
                                     module=module)
    oracle = nq.Model.from_onnx(oracle_proto)

    b = ContinuousBatcher(engine, proto._wte, None,
                          rope=proto._rope_tables, paged_kv=(3, 8))
    reqs = [(RNG.integers(0, 64, size=(k,)).astype(np.int32), n)
            for k, n in [(2, 5), (4, 4), (1, 7)]]
    got = b.run(reqs)
    for rid, (prompt, n_new) in enumerate(reqs):
        want = generate_kv(oracle, prompt[None, :], oracle_proto._wte,
                           None, max_new_tokens=n_new,
                           rope=oracle_proto._rope_tables)[0]
        np.testing.assert_array_equal(got[rid], want, err_msg=f"req {rid}")


def test_paged_prefill_fast_path(gpt_steps):
    """Prefill admissions scatter whole prompts into allocated blocks;
    results stay token-exact, including the teacher-forced fallback for
    a prompt longer than the prefill window and an at-admission finish
    (whose blocks must return to the pool)."""
    from numpy_quant_tpu.models.gpt import gpt_prefill

    engine, oracle, proto = gpt_steps
    prefill = nq.Model.from_onnx(
        gpt_prefill(prefill_len=6, module=proto._torch_module))
    reqs = [(RNG.integers(0, 96, size=(k,)).astype(np.int32), n)
            for k, n in [(1, 6), (4, 5), (8, 3), (2, 1), (5, 4)]]
    b = ContinuousBatcher(engine, proto._wte, proto._wpe,
                          prefill_model=prefill, paged_kv=(4, 12))
    got = b.run(reqs)
    assert b.stats["prefills"] == 4  # req 2 (plen 8 > 6) teacher-forces
    for rid, (prompt, n_new) in enumerate(reqs):
        want = _oracle_row(oracle, proto, prompt, n_new)
        np.testing.assert_array_equal(got[rid], want, err_msg=f"req {rid}")
    assert all(not o for o in b._owned)
    assert len(b._free) == 11


def test_paged_validation(gpt_steps):
    engine, _, proto = gpt_steps
    with pytest.raises(ValueError):
        ContinuousBatcher(engine, proto._wte, proto._wpe,
                          paged_kv=(0, 8))
    with pytest.raises(ValueError):
        ContinuousBatcher(engine, proto._wte, proto._wpe,
                          paged_kv=(4, 1))
    b = ContinuousBatcher(engine, proto._wte, proto._wpe,
                          paged_kv=(2, 4))   # 3 allocatable blocks
    with pytest.raises(ValueError):
        b.submit(np.zeros((4,), np.int32), 5)  # needs 4 blocks
    # state_carry engines have no KV cache to page
    from numpy_quant_tpu.models.mamba import mamba_decode_step
    mp = mamba_decode_step(batch_size=2, seed=0)
    me = nq.Model.from_onnx(mp)
    with pytest.raises(ValueError):
        ContinuousBatcher(me, mp._wte, state_carry=True, max_len=12,
                          paged_kv=(2, 8))


def test_paged_reset_reclaims_pool(gpt_steps):
    engine, oracle, proto = gpt_steps
    b = ContinuousBatcher(engine, proto._wte, proto._wpe,
                          paged_kv=(2, 10))
    prompt = RNG.integers(0, 96, size=(3,)).astype(np.int32)
    b.submit(prompt, 6)
    b.step()
    b.step()
    assert any(o for o in b._owned)
    b.reset()
    assert all(not o for o in b._owned)
    assert len(b._free) == 9
    got = b.run([(prompt, 6)])   # request ids keep counting past reset
    want = _oracle_row(oracle, proto, prompt, 6)
    np.testing.assert_array_equal(got[max(got)], want)
