"""utils.serving.ContinuousBatcher: slot-based online decode with
per-slot positions. Oracle: every completed request must be token-exact
with generate_kv run alone on a batch-1 step graph sharing the same
module -- regardless of what else shared the batch, when the request
arrived, or whose stale cache the slot still holds.
"""
import numpy as np
import pytest

import numpy_quant_tpu as nq
from numpy_quant_tpu.models.gpt import gpt_decode_step
from numpy_quant_tpu.utils import generate_kv
from numpy_quant_tpu.utils.serving import ContinuousBatcher

RNG = np.random.default_rng(61)
MAXLEN = 12


@pytest.fixture(scope="module")
def gpt_steps():
    """(engine step graph with 3 slots, batch-1 oracle graph, proto)."""
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


def test_mixed_lengths_match_lockstep_oracle(gpt_steps):
    """Five requests with different prompt lengths and budgets through
    3 slots: every result equals its solo generate_kv run."""
    engine, oracle, proto = gpt_steps
    b = ContinuousBatcher(engine, proto._wte, proto._wpe)
    reqs = [(RNG.integers(0, 96, size=(k,)).astype(np.int32), n)
            for k, n in [(1, 6), (3, 4), (2, 8), (5, 3), (4, 5)]]
    got = b.run([(p, n) for p, n in reqs])
    assert len(got) == 5
    for rid, (prompt, n_new) in enumerate(reqs):
        want = _oracle_row(oracle, proto, prompt, n_new)
        np.testing.assert_array_equal(got[rid], want, err_msg=f"req {rid}")


def test_mid_flight_admission_and_slot_reuse(gpt_steps):
    """A request admitted while others are mid-decode, into a slot that
    already served a previous request (stale cache), still matches its
    solo run; finished requests report as they finish, not at drain."""
    engine, oracle, proto = gpt_steps
    b = ContinuousBatcher(engine, proto._wte, proto._wpe)
    p0 = RNG.integers(0, 96, size=(2,)).astype(np.int32)
    p1 = RNG.integers(0, 96, size=(4,)).astype(np.int32)
    r0 = b.submit(p0, 2)   # finishes fast
    r1 = b.submit(p1, 7)   # keeps running
    done = {}
    for _ in range(3):
        for rid, toks in b.step():
            done[rid] = toks
    assert r0 in done and r1 not in done
    # r0's slot is free again; admit into it mid-flight
    p2 = RNG.integers(0, 96, size=(3,)).astype(np.int32)
    r2 = b.submit(p2, 5)
    while b.n_active or b.n_queued:
        for rid, toks in b.step():
            done[rid] = toks
    for rid, prompt, n_new in [(r0, p0, 2), (r1, p1, 7), (r2, p2, 5)]:
        want = _oracle_row(oracle, proto, prompt, n_new)
        np.testing.assert_array_equal(done[rid], want, err_msg=f"req {rid}")


def test_eos_retires_slot_early(gpt_steps):
    """With eos_id set to a token the greedy decode actually emits, the
    request retires at the EOS instead of running out its budget."""
    engine, oracle, proto = gpt_steps
    prompt = RNG.integers(0, 96, size=(3,)).astype(np.int32)
    full = _oracle_row(oracle, proto, prompt, 6)
    eos = int(full[3])  # the FIRST generated token: retire immediately
    b = ContinuousBatcher(engine, proto._wte, proto._wpe, eos_id=eos)
    got = b.run([(prompt, 6)])[0]
    np.testing.assert_array_equal(got, full[:4])
    assert got[-1] == eos


def test_overfull_queue_waits_for_slots(gpt_steps):
    """More requests than slots: the queue drains as slots free, and
    every result still matches its solo run."""
    engine, oracle, proto = gpt_steps
    b = ContinuousBatcher(engine, proto._wte, proto._wpe)
    reqs = [(RNG.integers(0, 96, size=(2,)).astype(np.int32), 3)
            for _ in range(7)]
    got = b.run(reqs)
    assert len(got) == 7
    for rid, (prompt, n_new) in enumerate(reqs):
        want = _oracle_row(oracle, proto, prompt, n_new)
        np.testing.assert_array_equal(got[rid], want)


def test_rope_layout_llama():
    """Per-row RoPE rows: the LLaMA step layout through the engine
    matches its lockstep generate_kv run."""
    from numpy_quant_tpu.models.llama import llama_decode_step

    proto = llama_decode_step(batch_size=2, max_len=10, seed=0)
    module = proto._torch_module
    engine = nq.Model.from_onnx(proto)
    oracle_proto = llama_decode_step(batch_size=1, max_len=10,
                                     module=module)
    oracle = nq.Model.from_onnx(oracle_proto)

    b = ContinuousBatcher(engine, proto._wte, None,
                          rope=proto._rope_tables)
    reqs = [(RNG.integers(0, 64, size=(k,)).astype(np.int32), n)
            for k, n in [(2, 5), (4, 4), (1, 7)]]
    got = b.run(reqs)
    for rid, (prompt, n_new) in enumerate(reqs):
        want = generate_kv(oracle, prompt[None, :], oracle_proto._wte,
                           None, max_new_tokens=n_new,
                           rope=oracle_proto._rope_tables)[0]
        np.testing.assert_array_equal(got[rid], want, err_msg=f"req {rid}")


def test_seq2seq_bias_memory_layout_t5():
    """Per-row score-bias rows AND per-slot encoder memory: the T5
    seq2seq layout through the engine matches lockstep generate_kv with
    each request's own memory."""
    import torch

    from numpy_quant_tpu.models.t5 import t5_decode_step

    proto = t5_decode_step(batch_size=2, max_len=8, src_len=6, seed=0)
    module = proto._torch_module
    engine = nq.Model.from_onnx(proto)
    oracle_proto = t5_decode_step(batch_size=1, max_len=8, src_len=6,
                                  module=module)
    oracle = nq.Model.from_onnx(oracle_proto)
    # fresh-module path computes no bias table; share the engine's
    oracle_bias = proto._decode_bias
    wte = proto._wte
    start = int(module.config.pad_token_id)

    mems = []
    for _ in range(3):
        src = RNG.integers(4, 96, size=(1, 6)).astype(np.int64)
        with torch.no_grad():
            mems.append(module.encoder(
                inputs_embeds=torch.from_numpy(
                    wte[src].astype(np.float32))).last_hidden_state.numpy())

    b = ContinuousBatcher(engine, wte, None, score_bias=proto._decode_bias,
                          has_memory=True)
    prompt = np.array([start], np.int32)
    got = b.run([(prompt, 5, mems[i][0]) for i in range(3)])
    for rid in range(3):
        want = generate_kv(oracle, prompt[None, :], wte, None,
                           max_new_tokens=5, score_bias=oracle_bias,
                           memory=mems[rid])[0]
        np.testing.assert_array_equal(got[rid], want, err_msg=f"req {rid}")


def test_quantized_step_model(gpt_steps):
    """An int8-quantized step model serves through the engine; results
    match ITS OWN lockstep generate_kv run (bit-exact integer path)."""
    from numpy_quant_tpu.utils import (decode_calibration,
                                       merge_calibration_stats)

    engine, oracle, proto = gpt_steps
    module = proto._torch_module
    prompt3 = RNG.integers(0, 96, size=(3, 4)).astype(np.int32)
    batches = decode_calibration(engine, prompt3, proto._wte, proto._wpe)
    stats = merge_calibration_stats(
        *[engine.calibration_stats(b) for b in batches])
    qengine = engine.quantize(stats=stats, bit_width=8)

    oracle_proto = gpt_decode_step(batch_size=1, max_len=MAXLEN,
                                   module=module)
    oracle1 = nq.Model.from_onnx(oracle_proto)
    qoracle = oracle1.quantize(stats=stats, bit_width=8)

    b = ContinuousBatcher(qengine, proto._wte, proto._wpe)
    reqs = [(RNG.integers(0, 96, size=(k,)).astype(np.int32), n)
            for k, n in [(2, 5), (4, 3), (1, 6)]]
    got = b.run(reqs)
    for rid, (prompt, n_new) in enumerate(reqs):
        want = generate_kv(qoracle, prompt[None, :], proto._wte,
                           proto._wpe, max_new_tokens=n_new)[0]
        np.testing.assert_array_equal(got[rid], want, err_msg=f"req {rid}")

    # int8 slot caches: bit-identical to the float-carry engine run
    b8 = ContinuousBatcher(qengine, proto._wte, proto._wpe,
                           kv_cache_dtype="int8")
    got8 = b8.run(reqs)
    for rid in got:
        np.testing.assert_array_equal(got8[rid], got[rid])
    with pytest.raises(ValueError):
        ContinuousBatcher(engine, proto._wte, proto._wpe,
                          kv_cache_dtype="int8")  # float model


def test_submit_validation(gpt_steps):
    engine, _, proto = gpt_steps
    b = ContinuousBatcher(engine, proto._wte, proto._wpe)
    with pytest.raises(ValueError):
        b.submit(np.zeros((0,), np.int32), 4)
    with pytest.raises(ValueError):
        b.submit(np.zeros((8,), np.int32), MAXLEN)  # exceeds cache
    with pytest.raises(ValueError):
        b.submit(np.zeros((2,), np.int32), 3, memory_row=np.zeros((4, 8)))


def test_prefill_fast_path(gpt_steps):
    """With a prefill graph attached, admissions land the whole prompt
    in one call; results stay token-exact with the teacher-forced
    engine AND the solo generate_kv runs -- including a prompt longer
    than the prefill length (falls back to teacher forcing), a
    one-token budget (finishes at admit), and EOS on the first
    generated token."""
    from numpy_quant_tpu.models.gpt import gpt_prefill

    engine, oracle, proto = gpt_steps
    pre_proto = gpt_prefill(prefill_len=6, module=proto._torch_module)
    prefill = nq.Model.from_onnx(pre_proto)

    reqs = [(RNG.integers(0, 96, size=(k,)).astype(np.int32), n)
            for k, n in [(1, 6), (4, 5), (8, 3), (2, 1), (5, 4)]]
    # req 2 (plen 8 > prefill 6) teacher-forces; req 3 (budget 1)
    # finishes at admission
    b = ContinuousBatcher(engine, proto._wte, proto._wpe,
                          prefill_model=prefill)
    got = b.run(reqs)
    plain = ContinuousBatcher(engine, proto._wte, proto._wpe).run(reqs)
    assert len(got) == 5
    for rid, (prompt, n_new) in enumerate(reqs):
        want = _oracle_row(oracle, proto, prompt, n_new)
        np.testing.assert_array_equal(got[rid], want, err_msg=f"req {rid}")
        np.testing.assert_array_equal(plain[rid], want)

    # EOS on the first generated token retires at admission
    prompt = reqs[1][0]
    full = _oracle_row(oracle, proto, prompt, 5)
    eos = int(full[4])
    b2 = ContinuousBatcher(engine, proto._wte, proto._wpe,
                           prefill_model=prefill, eos_id=eos)
    got2 = b2.run([(prompt, 5)])[0]
    np.testing.assert_array_equal(got2, full[:5])

    # layout guard: seq2seq/bias engines have no prefill path yet
    with pytest.raises(ValueError):
        from numpy_quant_tpu.models.t5 import t5_decode_step
        tp = t5_decode_step(batch_size=2, max_len=8, src_len=6, seed=0)
        tm = nq.Model.from_onnx(tp)
        ContinuousBatcher(tm, tp._wte, None,
                          score_bias=tp._decode_bias, has_memory=True,
                          prefill_model=prefill)


def test_prefill_fast_path_llama_rope():
    """llama_prefill (post-RoPE pre-repeat presents, the decode cache
    layout) admits prompts in one call on a RoPE engine; results stay
    token-exact with solo generate_kv."""
    from numpy_quant_tpu.models.llama import (llama_decode_step,
                                              llama_prefill)

    proto = llama_decode_step(batch_size=2, max_len=10, seed=0)
    module = proto._torch_module
    engine = nq.Model.from_onnx(proto)
    pre = nq.Model.from_onnx(llama_prefill(prefill_len=5, module=module))
    oracle_proto = llama_decode_step(batch_size=1, max_len=10,
                                     module=module)
    oracle = nq.Model.from_onnx(oracle_proto)

    b = ContinuousBatcher(engine, proto._wte, None,
                          rope=proto._rope_tables, prefill_model=pre)
    reqs = [(RNG.integers(0, 64, size=(k,)).astype(np.int32), n)
            for k, n in [(2, 5), (5, 4), (7, 3), (1, 6)]]
    # req 2 (plen 7 > prefill 5) teacher-forces
    got = b.run(reqs)
    for rid, (prompt, n_new) in enumerate(reqs):
        want = generate_kv(oracle, prompt[None, :], oracle_proto._wte,
                           None, max_new_tokens=n_new,
                           rope=oracle_proto._rope_tables)[0]
        np.testing.assert_array_equal(got[rid], want, err_msg=f"req {rid}")


def test_stats_and_reset(gpt_steps):
    """Engine counters track steps, slot utilization, prefills and
    completions; reset() zeroes them and in-flight state."""
    from numpy_quant_tpu.models.gpt import gpt_prefill

    engine, oracle, proto = gpt_steps
    pre = nq.Model.from_onnx(gpt_prefill(prefill_len=6,
                                         module=proto._torch_module))
    b = ContinuousBatcher(engine, proto._wte, proto._wpe,
                          prefill_model=pre)
    reqs = [(RNG.integers(0, 96, size=(2,)).astype(np.int32), 3)
            for _ in range(4)]
    got = b.run(reqs)
    s = b.stats
    assert s["completed"] == 4
    assert s["prefills"] == 4
    assert s["tokens_out"] == sum(len(t) - 2 for t in got.values())
    assert s["steps"] >= 2 and s["slot_steps"] >= s["steps"]

    b.reset()
    assert b.stats["completed"] == 0 and b.n_active == 0
    got2 = b.run(reqs)  # fresh run reproduces the same tokens
    # request ids keep counting across reset; compare in submit order
    for (r1, t1), (r2, t2) in zip(sorted(got.items()),
                                  sorted(got2.items())):
        np.testing.assert_array_equal(t1, t2)


def test_state_carry_mamba_engine():
    """state_carry=True serves SSM decode-step graphs: constant-size
    recurrent states zero at admission (no masks exist to hide stale
    slots); ragged requests match solo generate_mamba runs."""
    from numpy_quant_tpu.models.mamba import mamba_decode_step
    from numpy_quant_tpu.utils import generate_mamba

    proto = mamba_decode_step(batch_size=2, seed=0)
    module = proto._torch_module
    engine = nq.Model.from_onnx(proto)
    oracle_proto = mamba_decode_step(batch_size=1, module=module)
    oracle = nq.Model.from_onnx(oracle_proto)

    b = ContinuousBatcher(engine, proto._wte, state_carry=True,
                          max_len=12)
    reqs = [(RNG.integers(0, 96, size=(k,)).astype(np.int32), n)
            for k, n in [(2, 5), (4, 4), (1, 7), (3, 3)]]
    got = b.run(reqs)
    assert len(got) == 4
    for rid, (prompt, n_new) in enumerate(reqs):
        want = generate_mamba(oracle, prompt[None, :], proto._wte,
                              max_new_tokens=n_new)[0]
        np.testing.assert_array_equal(got[rid], want, err_msg=f"req {rid}")

    with pytest.raises(ValueError):
        ContinuousBatcher(engine, proto._wte, state_carry=True)  # no max_len
    with pytest.raises(ValueError):
        ContinuousBatcher(engine, proto._wte, state_carry=True,
                          max_len=12, kv_cache_dtype="int8")


def test_per_request_temperature(gpt_steps):
    """A sampled request co-batches with greedy ones: the greedy rows
    still match their solo oracle exactly, the sampled row is
    deterministic under the engine key and differs across keys."""
    import jax

    engine, oracle, proto = gpt_steps
    pg = RNG.integers(0, 96, size=(3,)).astype(np.int32)
    ps = RNG.integers(0, 96, size=(2,)).astype(np.int32)

    def run(key_seed):
        b = ContinuousBatcher(engine, proto._wte, proto._wpe,
                              key=jax.random.PRNGKey(key_seed))
        r_greedy = b.submit(pg, 5)
        r_samp = b.submit(ps, 6, temperature=5.0)
        out = {}
        while b.n_active or b.n_queued:
            for rid, toks in b.step():
                out[rid] = toks
        return out[r_greedy], out[r_samp]

    g1, s1 = run(0)
    g2, s2 = run(0)
    np.testing.assert_array_equal(g1, _oracle_row(oracle, proto, pg, 5))
    np.testing.assert_array_equal(g1, g2)   # greedy unaffected by key
    np.testing.assert_array_equal(s1, s2)   # sampling deterministic
    assert (s1 >= 0).all() and (s1 < 96).all()
    np.testing.assert_array_equal(s1[:2], ps)
    _, s3 = run(7)
    assert s3.shape == s1.shape  # a different key may (usually does)
    # change the continuation; the prompt prefix never changes
    np.testing.assert_array_equal(s3[:2], ps)


def test_steps_per_sync_matches_lockstep(gpt_steps):
    """steps_per_sync > 1 (k inner decode steps per dispatched program,
    amortizing the per-step host sync) produces bit-identical tokens to
    the k=1 engine: a slot finishing mid-chunk freezes via the inner
    active mask. Covers ragged budgets, EOS retirement and paged KV."""
    engine, oracle, proto = gpt_steps
    reqs = [(RNG.integers(0, 96, size=(k,)).astype(np.int32), n)
            for k, n in [(1, 6), (3, 4), (2, 8), (5, 3), (4, 5)]]

    base = ContinuousBatcher(engine, proto._wte, proto._wpe)
    want = base.run([(p, n) for p, n in reqs])
    for k in (2, 4):
        b = ContinuousBatcher(engine, proto._wte, proto._wpe,
                              steps_per_sync=k)
        got = b.run([(p, n) for p, n in reqs])
        assert len(got) == len(want)
        for rid in want:
            np.testing.assert_array_equal(got[rid], want[rid],
                                          err_msg=f"k={k} req {rid}")
        # the host sync count really dropped
        assert b.stats["steps"] <= base.stats["steps"] + k

    # EOS retirement mid-chunk: the emitted row still ends at the EOS
    eos = 7
    b1 = ContinuousBatcher(engine, proto._wte, proto._wpe, eos_id=eos)
    bk = ContinuousBatcher(engine, proto._wte, proto._wpe, eos_id=eos,
                           steps_per_sync=4)
    p = RNG.integers(0, 96, size=(2,)).astype(np.int32)
    w = b1.run([(p, 8)])
    g = bk.run([(p, 8)])
    np.testing.assert_array_equal(g[0], w[0])

    # paged KV: the chunk lookahead pre-allocates the blocks the inner
    # steps will cross
    bp1 = ContinuousBatcher(engine, proto._wte, proto._wpe,
                            paged_kv=(4, 16))
    bpk = ContinuousBatcher(engine, proto._wte, proto._wpe,
                            paged_kv=(4, 16), steps_per_sync=4)
    wp = bp1.run([(p2, n) for p2, n in reqs[:3]])
    gp = bpk.run([(p2, n) for p2, n in reqs[:3]])
    for rid in wp:
        np.testing.assert_array_equal(gp[rid], wp[rid],
                                      err_msg=f"paged k=4 req {rid}")


def test_steps_per_sync_with_prefill_admission(gpt_steps):
    """steps_per_sync composes with the one-call prefill fast path:
    admission fills the slot's cache via gpt_prefill, then chunks of 4
    decode steps run per dispatch -- tokens equal the k=1 engine."""
    from numpy_quant_tpu.models.gpt import gpt_prefill

    engine, oracle, proto = gpt_steps
    pre = nq.Model.from_onnx(gpt_prefill(prefill_len=6,
                                         module=proto._torch_module))
    reqs = [(RNG.integers(0, 96, size=(k,)).astype(np.int32), n)
            for k, n in [(4, 5), (2, 7), (6, 4), (3, 6)]]
    base = ContinuousBatcher(engine, proto._wte, proto._wpe,
                             prefill_model=pre)
    want = base.run([(p, n) for p, n in reqs])
    bk = ContinuousBatcher(engine, proto._wte, proto._wpe,
                           prefill_model=pre, steps_per_sync=4)
    got = bk.run([(p, n) for p, n in reqs])
    for rid in want:
        np.testing.assert_array_equal(got[rid], want[rid],
                                      err_msg=f"req {rid}")

def test_steps_per_sync_sampled_matches_lockstep(gpt_steps):
    """Temperature sampling under steps_per_sync>1 is bit-identical to
    the k=1 engine: the chunked program folds the ABSOLUTE global step
    index into the base PRNG key (fold_in(base, step0 + i)), exactly
    the fold_in(base, step) the lockstep engine uses. (Round-4 advisor
    finding: the old fold_in(fold_in(base, c*k), i) derivation gave
    sampled requests different tokens.)"""
    import jax

    engine, oracle, proto = gpt_steps
    prompts = [RNG.integers(0, 96, size=(n,)).astype(np.int32)
               for n in (2, 3, 1)]   # <= 3 slots: same slots, same steps

    def run(k):
        b = ContinuousBatcher(engine, proto._wte, proto._wpe,
                              key=jax.random.PRNGKey(11),
                              steps_per_sync=k)
        rids = [b.submit(p, 5 + i, temperature=0.0 if i == 0 else 4.0)
                for i, p in enumerate(prompts)]
        out = {}
        while b.n_active or b.n_queued:
            for rid, toks in b.step():
                out[rid] = toks
        return [out[r] for r in rids]

    want = run(1)
    assert len(want) == 3
    for k in (2, 4):
        got = run(k)
        for i, (w, g) in enumerate(zip(want, got)):
            np.testing.assert_array_equal(
                g, w, err_msg=f"k={k} request {i} (sampled)")
