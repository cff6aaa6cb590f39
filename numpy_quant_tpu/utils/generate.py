"""Autoregressive generation: the WHOLE decode loop as one XLA program.

Drives a causal-LM graph (models/gpt.py form: ``inputs_embeds``
[B, L, H] -> ``logits`` [B, L, V]) for greedy or temperature sampling.
TPU-native shape: the graph executes at its FIXED length L every step
under ``lax.fori_loop`` -- one compile, zero host round-trips, the
framework's jitted forward (float, int8 PTQ/QAT, or dynamic-quantized;
they all share ``lowered_fn``) traced once inside the loop body. Token
ids stay traced int32 device values throughout; only the final sequence
lands on the host.

The quadratic full-length re-forward per step is the price of keeping
the ONNX graph static -- right for the zoo's demo lengths. A KV-cache
decode path is a different graph form (per-step [B,1,H] with cache
carries), not a different loop.

The reference framework has no generation surface at all (it is
ViT-centric); this is parity-plus.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _placed_table(model, name: str, arr, dtype=None):
    """Device-resident copy of an embedding/RoPE/bias table, cached on
    the model keyed by the SOURCE array's identity.

    The tables are generate-call arguments (154 MB for GPT-2-Small's
    wte), and a bare ``jnp.asarray`` re-uploads them on every call --
    on a remote-attached chip that upload dominated the decode
    benchmark (BENCH_HISTORY.md round 4). The cache holds a reference
    to the source array, so an ``is`` hit is sound (a freed-then-reused
    id can never collide with a live key)."""
    if arr is None:
        return None
    cache = model.__dict__.setdefault("_table_cache", {})
    mesh = getattr(model, "mesh", None)
    hit = cache.get(name)
    # a cache hit also requires the model's mesh to be the one the
    # table was placed for: shard_model() after placement would
    # otherwise leave a stale single-device-committed table that
    # errors when mixed with mesh-sharded params in one jit call
    if hit is not None and hit[0] is arr and hit[1] is mesh:
        return hit[2]
    host = np.asarray(arr, np.dtype(dtype) if dtype is not None
                      else np.float32)
    if mesh is not None:
        # sharded model: replicate the table onto the mesh (mixing a
        # single-device-committed array with mesh-sharded params in one
        # jit call is an error)
        from jax.sharding import NamedSharding, PartitionSpec
        dev = jax.device_put(host, NamedSharding(model.mesh,
                                                 PartitionSpec()))
    else:
        dev = jax.device_put(host, jax.devices()[0])
    cache[name] = (arr, mesh, dev)
    return dev


def _next_token(row, temperature, top_k, top_p, key, min_p=None,
                presence=None, repetition_penalty=None):
    """Pick the next token from a [B, V] logit row: greedy argmax when
    no sampling knob is set, else temperature/top-k/top-p/min-p
    filtered categorical sampling (all traced; runs inside the decode
    loop). ``repetition_penalty`` (HF CTRL semantics: positive logits
    divide, negative multiply) applies first, to the tokens marked in
    the [B, V] ``presence`` mask (tokens already in the row's
    sequence); it composes with greedy decoding too."""
    if repetition_penalty is not None and presence is not None:
        pen = jnp.float32(repetition_penalty)
        penalized = jnp.where(row > 0, row / pen, row * pen)
        row = jnp.where(presence > 0, penalized, row)
    if temperature is None and top_k is None and top_p is None \
            and min_p is None:
        return jnp.argmax(row, axis=-1).astype(jnp.int32)
    logits = row / jnp.float32(1.0 if temperature is None else temperature)
    neg = jnp.float32(-1e30)
    if top_k is not None:
        kth = jax.lax.top_k(logits, int(top_k))[0][..., -1:]
        logits = jnp.where(logits < kth, neg, logits)
    if min_p is not None:
        # keep tokens whose probability is >= min_p * the mode's
        # (arXiv:2407.01082); the mode always survives
        probs = jax.nn.softmax(logits, axis=-1)
        cap = probs.max(axis=-1, keepdims=True) * jnp.float32(min_p)
        logits = jnp.where(probs < cap, neg, logits)
    if top_p is not None:
        # nucleus: keep the smallest prefix of the sorted distribution
        # whose mass reaches top_p (the first token always survives)
        v = logits.shape[-1]
        sorted_logits, sorted_idx = jax.lax.top_k(logits, v)
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        drop = cum - probs > jnp.float32(top_p)
        masked = jnp.where(drop, neg, sorted_logits)
        b_idx = jnp.arange(logits.shape[0])[:, None]
        logits = jnp.full_like(logits, neg).at[b_idx, sorted_idx].set(masked)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def generate(model, prompt_ids: np.ndarray, wte: np.ndarray,
             max_new_tokens: int, temperature: float = None,
             top_k: int = None, top_p: float = None,
             key=None, min_p: float = None,
             repetition_penalty: float = None) -> np.ndarray:
    """Generate ``max_new_tokens`` continuations of ``prompt_ids``
    [B, T0] with ``model`` (any Model/QModel over an inputs_embeds
    causal graph) and the token-embedding table ``wte`` [V, H].

    Greedy argmax by default; ``temperature``/``top_k``/``top_p``/
    ``min_p`` (and optionally a PRNG ``key``) switch to filtered
    categorical sampling. ``repetition_penalty`` down-weights tokens
    already in the row's sequence (HF CTRL semantics) and composes
    with greedy decoding too.
    Returns [B, T0 + max_new_tokens] int ids. T0 + max_new_tokens must
    fit the graph's fixed length L; the causal mask guarantees the
    padded tail never influences live positions.
    """
    prompt_ids = np.asarray(prompt_ids)
    batch, t0 = prompt_ids.shape
    in_shape = model.inputs[0].shape_hint
    length = int(in_shape[1]) if in_shape is not None else None
    if length is not None and t0 + max_new_tokens > length:
        raise ValueError(
            f"prompt {t0} + {max_new_tokens} new tokens exceeds the "
            f"graph's fixed length {length}")
    length = length if length is not None else t0 + max_new_tokens

    fwd = model.lowered_fn()
    if key is None:
        key = jax.random.PRNGKey(0)

    sampling = (temperature is not None or top_k is not None
                or top_p is not None or min_p is not None)

    # params and the embedding table enter as jit ARGUMENTS, not
    # closure constants: closed-over arrays embed into the HLO as
    # literals, which bloats the program body by the whole model size
    # (and overflows remote-compile request limits at real scale)
    def run(prompt, params, wte_j, key):
        def body(i, carry):
            embeds, ids, key = carry
            t = t0 - 1 + i  # position whose logits predict token t+1
            logits = fwd([embeds], params)[0]
            row = jax.lax.dynamic_slice_in_dim(logits, t, 1,
                                               axis=1)[:, 0, :]
            if sampling:
                key, sub = jax.random.split(key)
            else:
                sub = key
            presence = None
            if repetition_penalty is not None:
                # [B, V] mask of tokens at the filled positions 0..t
                valid = (jnp.arange(ids.shape[1])[None, :]
                         <= t).astype(jnp.float32)
                presence = jnp.zeros(row.shape, jnp.float32).at[
                    jnp.arange(ids.shape[0])[:, None], ids].max(valid)
            nxt = _next_token(row, temperature, top_k, top_p, sub,
                              min_p, presence, repetition_penalty)
            embeds = jax.lax.dynamic_update_slice_in_dim(
                embeds, jnp.take(wte_j, nxt, axis=0)[:, None, :], t + 1,
                axis=1)
            ids = jax.lax.dynamic_update_slice_in_dim(
                ids, nxt[:, None], t + 1, axis=1)
            return embeds, ids, key

        embeds = jnp.zeros((batch, length, wte_j.shape[1]), jnp.float32)
        embeds = embeds.at[:, :t0, :].set(jnp.take(wte_j, prompt, axis=0))
        ids = jnp.zeros((batch, length), jnp.int32)
        ids = ids.at[:, :t0].set(prompt)
        embeds, ids, _ = jax.lax.fori_loop(
            0, max_new_tokens, body, (embeds, ids, key))
        return ids

    # the jitted loop caches on the model: defining run() fresh per
    # call is free, but jitting it fresh per call re-traces and
    # re-lowers the whole unrolled step graph every time (~6.6 s per
    # GPT-Small decode over a remote-compile tunnel, BENCH_HISTORY.md
    # round 4). Every closure-baked value is in the key; mutation
    # invalidates via model._jit_cache.clear().
    ck = ("generate", batch, t0, int(max_new_tokens), length,
          temperature, top_k, top_p, min_p, repetition_penalty,
          bool(jax.config.jax_enable_x64))
    run_jit = model._jit_cache.setdefault(ck, jax.jit(run))
    out = run_jit(jnp.asarray(prompt_ids, jnp.int32),
                  model._placed_params(),
                  _placed_table(model, "wte", wte), key)
    return np.asarray(out)[:, : t0 + max_new_tokens]


def beam_search(model, prompt_ids: np.ndarray, wte: np.ndarray,
                max_new_tokens: int, num_beams: int,
                eos_id: int = None):
    """Beam-search decode over a full-sequence causal graph (the
    :func:`generate` graph form), the WHOLE search as one compiled XLA
    program: at every step all ``B*num_beams`` hypotheses forward as
    ONE batch (the graph must be built with batch ``B*num_beams``),
    candidate scores expand to [B, W*V], and a single ``lax.top_k``
    + beam-gather reorders the carry -- no host round trips, no
    dynamic shapes.

    Scores are summed token log-probabilities. With ``eos_id`` set, a
    beam that emits EOS freezes: its score stops accumulating and its
    only continuation is EOS itself (the standard "finished beam"
    rule). Returns ``(ids, scores)``: ids [B, num_beams,
    T0+max_new_tokens] int32 and scores [B, num_beams] float32, both
    sorted best-first.

    The reference framework has no generation surface at all; like
    :func:`generate` this is parity-plus.
    """
    prompt_ids = np.asarray(prompt_ids)
    batch, t0 = prompt_ids.shape
    w = int(num_beams)
    in_shape = model.inputs[0].shape_hint
    if in_shape is not None and int(in_shape[0]) != batch * w:
        raise ValueError(
            f"beam search over {batch} prompts x {w} beams needs a "
            f"graph with batch {batch * w}, got {int(in_shape[0])}")
    length = int(in_shape[1]) if in_shape is not None else \
        t0 + max_new_tokens
    if t0 + max_new_tokens > length:
        raise ValueError(
            f"prompt {t0} + {max_new_tokens} new tokens exceeds the "
            f"graph's fixed length {length}")

    vocab, hidden = np.asarray(wte).shape
    fwd = model.lowered_fn()
    neg = jnp.float32(-1e30)

    def body(i, carry, params, wte_j):
        embeds, ids, scores, done = carry
        t = t0 - 1 + i
        logits = fwd([embeds.reshape(batch * w, length, hidden)],
                     params)[0]
        row = jax.lax.dynamic_slice_in_dim(logits, t, 1, axis=1)
        logp = jax.nn.log_softmax(
            row.reshape(batch, w, vocab).astype(jnp.float32), axis=-1)
        cand = scores[:, :, None] + logp        # [B, W, V]
        if eos_id is not None:
            # finished beams: score frozen, sole continuation is EOS
            frozen = jnp.full((batch, w, vocab), neg) \
                .at[:, :, eos_id].set(scores)
            cand = jnp.where(done[:, :, None], frozen, cand)
        top_scores, flat = jax.lax.top_k(cand.reshape(batch, w * vocab), w)
        beam_idx = flat // vocab                # [B, W] source beam
        tok = (flat % vocab).astype(jnp.int32)  # [B, W] next token
        b_idx = jnp.arange(batch)[:, None]
        ids = ids[b_idx, beam_idx]              # reorder beam histories
        ids = jax.lax.dynamic_update_slice_in_dim(
            ids, tok[:, :, None], t + 1, axis=2)
        embeds = embeds[b_idx, beam_idx]
        embeds = jax.lax.dynamic_update_slice_in_dim(
            embeds, jnp.take(wte_j, tok, axis=0)[:, :, None, :], t + 1,
            axis=2)
        if eos_id is not None:
            done = done[b_idx, beam_idx] | (tok == eos_id)
        return embeds, ids, top_scores, done

    def run(prompt, params, wte_j):
        pe = jnp.take(wte_j, prompt, axis=0)    # [B, T0, H]
        embeds = jnp.zeros((batch, w, length, hidden), jnp.float32)
        embeds = embeds.at[:, :, :t0, :].set(pe[:, None])
        ids = jnp.zeros((batch, w, length), jnp.int32)
        ids = ids.at[:, :, :t0].set(prompt[:, None, :])
        # only beam 0 is live at step 0, else the W beams would all
        # pick the same top token
        scores = jnp.full((batch, w), neg).at[:, 0].set(0.0)
        done = jnp.zeros((batch, w), bool)
        embeds, ids, scores, _ = jax.lax.fori_loop(
            0, max_new_tokens,
            lambda i, c: body(i, c, params, wte_j),
            (embeds, ids, scores, done))
        return ids, scores

    ck = ("beam_search", batch, t0, w, int(max_new_tokens), length,
          eos_id, bool(jax.config.jax_enable_x64))
    run_jit = model._jit_cache.setdefault(ck, jax.jit(run))
    ids, scores = run_jit(jnp.asarray(prompt_ids, jnp.int32),
                          model._placed_params(),
                          _placed_table(model, "wte", wte))
    return (np.asarray(ids)[:, :, : t0 + max_new_tokens],
            np.asarray(scores))


def generate_speculative(target_model, draft_model, prompt_ids: np.ndarray,
                         wte_target: np.ndarray, wte_draft: np.ndarray,
                         max_new_tokens: int, k: int = 4):
    """Greedy speculative decoding: a cheap ``draft_model`` proposes
    ``k`` tokens per round, the ``target_model`` verifies them in ONE
    batched forward, and the longest matching prefix (plus the target's
    own correction token) is accepted -- so each round costs one target
    forward but can advance up to ``k+1`` tokens. With greedy
    acceptance the output is IDENTICAL to target-only greedy decoding
    (asserted in tests/test_speculative.py); the draft only changes how
    many target forwards it takes to get there.

    Both models are full-sequence causal graphs (the :func:`generate`
    form) over the same vocabulary and batch; each embeds with its own
    table (``wte_target``/``wte_draft``), so the draft may be a smaller
    width/depth. Rows advance independently (per-row position masks);
    the whole loop -- draft proposals, target verify, accept/advance --
    is one compiled XLA program under ``lax.while_loop``.

    Graph lengths must cover ``T0 + max_new_tokens + k - 1`` (a round
    near the end still drafts ``k`` ahead). Returns
    ``(ids [B, T0+max_new_tokens], target_forwards)`` -- the second is
    the number of verify rounds actually run (host int), the
    speculation speedup diagnostic: plain greedy would use
    ``max_new_tokens`` forwards.
    """
    prompt_ids = np.asarray(prompt_ids)
    batch, t0 = prompt_ids.shape
    total = t0 + max_new_tokens
    for m, which in ((target_model, "target"), (draft_model, "draft")):
        hint = m.inputs[0].shape_hint
        if hint is not None and int(hint[1]) < total + k - 1:
            raise ValueError(
                f"{which} graph length {int(hint[1])} < T0 + "
                f"max_new_tokens + k - 1 = {total + k - 1}")
    lt = int(target_model.inputs[0].shape_hint[1])
    ld = int(draft_model.inputs[0].shape_hint[1])

    fwd_t = target_model.lowered_fn()
    fwd_d = draft_model.lowered_fn()

    def write_col(buf, col, val):
        """buf[b, col[b]] = val[b] with a per-row position mask
        (col may differ per batch row; out-of-range writes no-op)."""
        pos = jax.lax.broadcasted_iota(jnp.int32, buf.shape[:2], 1)
        mask = pos == col[:, None]
        if buf.ndim == 3:
            return jnp.where(mask[:, :, None], val[:, None, :], buf)
        return jnp.where(mask, val[:, None], buf)

    def read_col(arr, col):
        """arr[b, col[b]] (clamped)."""
        c = jnp.clip(col, 0, arr.shape[1] - 1)
        out = jnp.take_along_axis(
            arr, c[:, None, None] if arr.ndim == 3 else c[:, None], axis=1)
        return out[:, 0]

    def body(carry, params_t, params_d, wte_t, wte_d):
        ids, emb_t, emb_d, t, rounds = carry
        # -- draft k greedy proposals (k cheap forwards) --------------
        d_toks = jnp.zeros((batch, k), jnp.int32)
        for i in range(k):
            logits = fwd_d([emb_d], params_d)[0]
            tok = jnp.argmax(read_col(logits, t + i - 1), -1) \
                .astype(jnp.int32)
            d_toks = d_toks.at[:, i].set(tok)
            emb_d = write_col(emb_d, t + i, jnp.take(wte_d, tok, axis=0))
            emb_t = write_col(emb_t, t + i, jnp.take(wte_t, tok, axis=0))
        # -- ONE target forward verifies all k proposals --------------
        logits = fwd_t([emb_t], params_t)[0]
        y = jnp.stack([jnp.argmax(read_col(logits, t + i - 1), -1)
                       .astype(jnp.int32) for i in range(k + 1)], axis=1)
        # longest matching prefix: n in [0, k]
        match = d_toks == y[:, :k]
        # explicit int32: x64 mode would promote the reduce to int64
        # and break the while_loop carry dtype invariance
        n = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1),
                    axis=1).astype(jnp.int32)
        # accepted draft tokens are already in emb_*; write them into
        # ids, then the correction token y[n] at position t+n
        for i in range(k):
            live = (jnp.int32(i) < n) & (t + i < total)
            ids = jnp.where(live[:, None],
                            write_col(ids, t + i, d_toks[:, i]), ids)
        corr = jnp.take_along_axis(y, n[:, None], axis=1)[:, 0]
        at = t + n
        live = at < total
        ids = jnp.where(live[:, None], write_col(ids, at, corr), ids)
        emb_t = jnp.where(live[:, None, None],
                          write_col(emb_t, at, jnp.take(wte_t, corr, 0)),
                          emb_t)
        emb_d = jnp.where(live[:, None, None],
                          write_col(emb_d, at, jnp.take(wte_d, corr, 0)),
                          emb_d)
        t = jnp.minimum(t + n + 1, total).astype(jnp.int32)
        return ids, emb_t, emb_d, t, rounds + jnp.int32(1)

    def run(prompt, params_t, params_d, wte_t, wte_d):
        ids = jnp.zeros((batch, total), jnp.int32).at[:, :t0].set(prompt)
        emb_t = jnp.zeros((batch, lt, wte_t.shape[1]), jnp.float32) \
            .at[:, :t0, :].set(jnp.take(wte_t, prompt, axis=0))
        emb_d = jnp.zeros((batch, ld, wte_d.shape[1]), jnp.float32) \
            .at[:, :t0, :].set(jnp.take(wte_d, prompt, axis=0))
        t = jnp.full((batch,), t0, jnp.int32)
        carry = (ids, emb_t, emb_d, t, jnp.int32(0))
        ids, _, _, _, rounds = jax.lax.while_loop(
            lambda c: jnp.min(c[3]) < total,
            lambda c: body(c, params_t, params_d, wte_t, wte_d), carry)
        return ids, rounds

    # cached on the TARGET model; the value holds a strong draft ref
    # so the id() key can never alias a different (collected) draft
    ck = ("generate_speculative", batch, t0, int(max_new_tokens), k,
          lt, ld, id(draft_model), bool(jax.config.jax_enable_x64))
    if ck not in target_model._jit_cache:
        target_model._jit_cache[ck] = (jax.jit(run), draft_model)
    run_jit = target_model._jit_cache[ck][0]
    ids, rounds = run_jit(jnp.asarray(prompt_ids, jnp.int32),
                          target_model._placed_params(),
                          draft_model._placed_params(),
                          _placed_table(target_model, "wte", wte_target),
                          _placed_table(draft_model, "wte", wte_draft))
    return np.asarray(ids), int(rounds)


def generate_seq2seq(enc_model, dec_model, src_ids: np.ndarray,
                     wte: np.ndarray, max_new_tokens: int,
                     decoder_start_id: int, temperature: float = None,
                     top_k: int = None, top_p: float = None,
                     key=None) -> np.ndarray:
    """Encoder-decoder generation (models/seq2seq.py graph forms):
    run the encoder ONCE over ``src_ids`` [B, S], then autoregressively
    decode against the resulting memory -- encoder forward and the
    whole decode loop in ONE compiled XLA program. ``enc_model`` /
    ``dec_model`` are any Model/QModel over the bart_encoder /
    bart_decoder graphs (float, PTQ, or QAT; they may be quantized
    independently). Positions and layernorm_embedding live INSIDE the
    graphs; only the token-embedding gather (``wte`` [V, H]) happens in
    raw JAX here, so ids stay traced int32 throughout.

    Returns [B, 1 + max_new_tokens] int ids starting with
    ``decoder_start_id``. 1 + max_new_tokens must fit the decoder
    graph's fixed target length; its causal self-attention guarantees
    the padded tail never influences live positions (cross-attention
    reads the full memory, which is position-independent).

    ``src_ids`` may instead be a FLOAT array: it then feeds the encoder
    directly (audio features / raw embeds -- models/whisper.py's
    ``input_features``) and ``wte`` is used only for the decoder's
    token-embedding gather.
    """
    src_ids = np.asarray(src_ids)
    batch = src_ids.shape[0]
    tgt_hint = dec_model.inputs[0].shape_hint
    length = int(tgt_hint[1])
    if 1 + max_new_tokens > length:
        raise ValueError(
            f"start token + {max_new_tokens} new tokens exceeds the "
            f"decoder graph's fixed length {length}")

    enc_fwd = enc_model.lowered_fn()
    dec_fwd = dec_model.lowered_fn()
    if key is None:
        key = jax.random.PRNGKey(0)
    sampling = (temperature is not None or top_k is not None
                or top_p is not None)

    def body(i, carry, dec_params, wte_j):
        embeds, ids, memory, key = carry
        logits = dec_fwd([embeds, memory], dec_params)[0]
        row = jax.lax.dynamic_slice_in_dim(logits, i, 1, axis=1)[:, 0, :]
        if sampling:
            key, sub = jax.random.split(key)
        else:
            sub = key
        nxt = _next_token(row, temperature, top_k, top_p, sub)
        embeds = jax.lax.dynamic_update_slice_in_dim(
            embeds, jnp.take(wte_j, nxt, axis=0)[:, None, :], i + 1, axis=1)
        ids = jax.lax.dynamic_update_slice_in_dim(
            ids, nxt[:, None], i + 1, axis=1)
        return embeds, ids, memory, key

    def run(src, enc_params, dec_params, wte_j, key):
        enc_in = src if jnp.issubdtype(src.dtype, jnp.floating) \
            else jnp.take(wte_j, src, axis=0)
        memory = enc_fwd([enc_in], enc_params)[0]
        start = jnp.full((batch,), decoder_start_id, jnp.int32)
        embeds = jnp.zeros((batch, length, wte_j.shape[1]), jnp.float32)
        embeds = embeds.at[:, 0, :].set(jnp.take(wte_j, start, axis=0))
        ids = jnp.zeros((batch, length), jnp.int32).at[:, 0].set(start)
        _, ids, _, _ = jax.lax.fori_loop(
            0, max_new_tokens,
            lambda i, c: body(i, c, dec_params, wte_j),
            (embeds, ids, memory, key))
        return ids

    src = jnp.asarray(src_ids) if np.issubdtype(src_ids.dtype, np.floating) \
        else jnp.asarray(src_ids, jnp.int32)
    ck = ("generate_seq2seq", batch, length, int(max_new_tokens),
          decoder_start_id, temperature, top_k, top_p, id(enc_model),
          bool(jax.config.jax_enable_x64))
    if ck not in dec_model._jit_cache:
        # strong encoder ref rides with the entry (id() stability)
        dec_model._jit_cache[ck] = (jax.jit(run), enc_model)
    out = dec_model._jit_cache[ck][0](
        src, enc_model._placed_params(), dec_model._placed_params(),
        _placed_table(dec_model, "wte", wte), key)
    return np.asarray(out)[:, : 1 + max_new_tokens]


def _kv_loop_key(batch, t0, max_new_tokens, kv_cache_dtype, rope,
                 temperature, top_k, top_p, min_p, repetition_penalty):
    """Cache key for generate_kv's jitted loop: every value the closure
    bakes into the trace. utils/aot.py rebuilds it to export the cached
    program (save_decode_loop)."""
    return ("generate_kv", batch, t0, int(max_new_tokens),
            kv_cache_dtype, rope is None, temperature, top_k, top_p,
            min_p, repetition_penalty, bool(jax.config.jax_enable_x64))


def _kv_layout(step_model, cache_start: int = 2):
    """(n_layer, batch, heads, max_len, head_dim) from the decode-step
    graph's input hints (models/gpt.py gpt_decode_step input order;
    ``cache_start=4`` for the RoPE form, models/llama.py, whose inputs
    insert cos_step/sin_step before the caches)."""
    n_layer = (len(step_model.inputs) - cache_start) // 2
    b, nh, length, hd = step_model.inputs[cache_start].shape_hint
    return n_layer, b, nh, length, hd


def _step_mask(t, length):
    mask = jnp.where(jnp.arange(length) < t, jnp.float32(0),
                     jnp.float32(-1e9))
    mask = jnp.concatenate([mask, jnp.zeros((1,), jnp.float32)])  # self
    return mask.reshape(1, 1, 1, length + 1)


def generate_kv(step_model, prompt_ids: np.ndarray, wte: np.ndarray,
                wpe: np.ndarray, max_new_tokens: int,
                temperature: float = None, top_k: int = None,
                top_p: float = None, key=None,
                kv_cache_dtype: str = None, rope=None,
                score_bias: np.ndarray = None,
                memory: np.ndarray = None, min_p: float = None,
                repetition_penalty: float = None) -> np.ndarray:
    """Autoregressive decode through the KV-cache step graph
    (models/gpt.py gpt_decode_step): one token per step at O(L) cost,
    the whole loop -- prefill (teacher-forced) and generation -- ONE
    compiled XLA program. Cache updates are raw-JAX
    dynamic_update_slice on the loop carry; the graph itself stays
    static. Same contract as :func:`generate` otherwise.

    ``kv_cache_dtype="int8"`` (quantized step models only) stores the
    cache carries as int8 -- 4x less KV HBM -- by quantizing each
    present with ITS cache input's calibrated params outside the graph;
    the executor then enters the integer domain directly. Quantization
    is idempotent, so the tokens are bit-identical to the float-carry
    run of the same quantized model.

    ``rope=(cos, sin)`` (each [1, 1, L, head_dim], e.g. a llama step
    model's ``_rope_tables``) switches to the RoPE input layout
    (models/llama.py llama_decode_step): the position-t rows are fed as
    the graph's ``cos_step``/``sin_step`` inputs and ``wpe`` may be
    None (rotary models have no additive position embedding).

    ``score_bias=`` ([L, H, L+1], e.g. a T5 step model's
    ``_decode_bias``) feeds the graph a per-step additive score row:
    at step t the table's row t enters as the ``score_bias`` input
    [1, H, 1, L+1] every self-attention Adds after the mask -- T5's
    relative position bias evaluated at query position t over the
    cache slots plus the self column (models/t5.py t5_decode_step).

    ``memory=`` ([B, S, d], an encoder output) switches to the seq2seq
    step layout (models/whisper.py whisper_decode_step): the graph's
    ``encoder_memory`` input rides after the mask. It is loop-invariant
    inside the decode while-loop, so XLA hoists the cross-attention K/V
    projections out of the body -- they compute once per call, not per
    token.
    """
    prompt_ids = np.asarray(prompt_ids)
    batch, t0 = prompt_ids.shape
    cache_start = (2 if rope is None else 4) \
        + (0 if score_bias is None else 1) \
        + (0 if memory is None else 1)
    n_layer, b, nh, length, hd = _kv_layout(step_model, cache_start)
    if b != batch:
        raise ValueError(f"graph batch {b} != prompt batch {batch}")
    if t0 + max_new_tokens - 1 > length:
        raise ValueError(
            f"prompt {t0} + {max_new_tokens} new tokens exceeds the "
            f"cache length {length}")

    wte_j = _placed_table(step_model, "wte", wte)
    wpe_j = _placed_table(step_model, "wpe", wpe)
    if rope is not None:
        cos_j = _placed_table(step_model, "rope_cos", rope[0])
        sin_j = _placed_table(step_model, "rope_sin", rope[1])
    else:
        cos_j = sin_j = None
    bias_j = _placed_table(step_model, "score_bias", score_bias)
    mem_j = None if memory is None else jnp.asarray(memory, jnp.float32)
    fwd = step_model.lowered_fn()
    if key is None:
        key = jax.random.PRNGKey(0)
    total = t0 + max_new_tokens

    if kv_cache_dtype is None:
        def q_cache(x, _):
            return x
        cache_qps = [None] * (2 * n_layer)
        cache_dtype = jnp.float32
    elif kv_cache_dtype == "int8":
        qp_map = getattr(step_model, "quant_params", None)
        if qp_map is None:
            raise ValueError("kv_cache_dtype='int8' needs a quantized "
                             "step model (its calibrated cache params "
                             "set the storage scale)")
        from ..quantization import quantize as _quantize

        def q_cache(x, qp):
            return _quantize(x, step_model.bit_width, qp.scale,
                             qp.zero_point).astype(jnp.int8)
        cache_qps = [qp_map[v.name]
                     for v in step_model.inputs[cache_start:]]
        cache_dtype = jnp.int8
    else:
        raise ValueError(f"kv_cache_dtype {kv_cache_dtype!r} not in "
                         "(None, 'int8')")

    sampling = (temperature is not None or top_k is not None
                or top_p is not None or min_p is not None)

    # params and the embedding/RoPE tables enter as jit ARGUMENTS, not
    # closure constants (closed-over arrays embed into the HLO body)
    def run(prompt, params, wte_j, wpe_j, cos_j, sin_j, bias_j, mem_j,
            key):
        def body(t, carry):
            ids, caches, key = carry
            tok = jnp.take(ids, t, axis=1)
            x = jnp.take(wte_j, tok, axis=0)
            if wpe_j is not None:
                x = x + jnp.take(wpe_j, t, axis=0)
            x = x[:, None, :]
            extra = []
            if rope is not None:
                extra = [
                    jax.lax.dynamic_slice_in_dim(cos_j, t, 1, axis=2),
                    jax.lax.dynamic_slice_in_dim(sin_j, t, 1, axis=2)]
            if bias_j is not None:
                # [1, H, L+1] row t -> the graph's [1, H, 1, L+1] input
                row = jax.lax.dynamic_slice_in_dim(bias_j, t, 1, axis=0)
                extra = extra + [row[:, :, None, :]]
            if mem_j is not None:
                extra = extra + [mem_j]
            flat = [c for pair in caches for c in pair]
            outs = fwd([x, _step_mask(t, length)] + extra + flat, params)
            row = outs[0][:, 0, :]
            if sampling:
                key, sub = jax.random.split(key)
            else:
                sub = key
            presence = None
            if repetition_penalty is not None:
                valid = (jnp.arange(ids.shape[1])[None, :]
                         <= t).astype(jnp.float32)
                presence = jnp.zeros(row.shape, jnp.float32).at[
                    jnp.arange(ids.shape[0])[:, None], ids].max(valid)
            nxt = _next_token(row, temperature, top_k, top_p, sub,
                              min_p, presence, repetition_penalty)
            caches = tuple(
                (jax.lax.dynamic_update_slice_in_dim(
                    k, q_cache(outs[1 + 2 * i], cache_qps[2 * i]), t,
                    axis=2),
                 jax.lax.dynamic_update_slice_in_dim(
                     v, q_cache(outs[2 + 2 * i], cache_qps[2 * i + 1]),
                     t, axis=2))
                for i, (k, v) in enumerate(caches))
            cand = jax.lax.dynamic_update_slice_in_dim(ids, nxt[:, None],
                                                       t + 1, axis=1)
            # teacher forcing: inside the prompt the next token is given
            ids = jnp.where(t + 1 >= t0, cand, ids)
            return ids, caches, key

        ids = jnp.zeros((batch, total), jnp.int32).at[:, :t0].set(prompt)
        # int8 carries initialize to quantize(0.0) (= the zero point),
        # exactly what the executor's on-entry quantize of a float zero
        # buffer produces -- the masked tail stays bit-identical
        zeros = jnp.zeros((batch, nh, length, hd), jnp.float32)
        caches = tuple(
            (q_cache(zeros, cache_qps[2 * i]).astype(cache_dtype),
             q_cache(zeros, cache_qps[2 * i + 1]).astype(cache_dtype))
            for i in range(n_layer))
        ids, _, _ = jax.lax.fori_loop(0, total - 1, body,
                                      (ids, caches, key))
        return ids

    ck = _kv_loop_key(batch, t0, max_new_tokens, kv_cache_dtype,
                      rope, temperature, top_k, top_p, min_p,
                      repetition_penalty)
    run_jit = step_model._jit_cache.setdefault(ck, jax.jit(run))
    return np.asarray(run_jit(jnp.asarray(prompt_ids, jnp.int32),
                              step_model._placed_params(), wte_j, wpe_j,
                              cos_j, sin_j, bias_j, mem_j, key))


def decode_calibration(step_model, prompt_ids: np.ndarray,
                       wte: np.ndarray, wpe: np.ndarray,
                       rope=None, score_bias: np.ndarray = None,
                       memory: np.ndarray = None) -> list:
    """Replay ``prompt_ids`` (teacher-forced) through the float decode
    step and return one input-list per step -- per-step calibration
    batches for quantizing the step graph. Compose with
    ``Model.calibration_stats`` + ``utils.merge_calibration_stats``,
    then ``quantize(stats=...)``. ``rope``/``wpe``/``score_bias``/
    ``memory`` as in :func:`generate_kv`."""
    prompt_ids = np.asarray(prompt_ids)
    batch, t0 = prompt_ids.shape
    cache_start = (2 if rope is None else 4) \
        + (0 if score_bias is None else 1) \
        + (0 if memory is None else 1)
    n_layer, b, nh, length, hd = _kv_layout(step_model, cache_start)
    caches = [np.zeros((batch, nh, length, hd), np.float32)
              for _ in range(2 * n_layer)]
    out = []
    for t in range(t0):
        x = wte[prompt_ids[:, t]]
        if wpe is not None:
            x = x + wpe[t]
        x = x[:, None, :].astype(np.float32)
        mask = np.asarray(_step_mask(t, length), np.float32)
        extra = []
        if rope is not None:
            extra = [np.asarray(rope[0][:, :, t : t + 1, :], np.float32),
                     np.asarray(rope[1][:, :, t : t + 1, :], np.float32)]
        if score_bias is not None:
            extra = extra + [
                np.asarray(score_bias[t], np.float32)[None, :, None, :]]
        if memory is not None:
            extra = extra + [np.asarray(memory, np.float32)]
        inputs = [x, mask] + extra + [c.copy() for c in caches]
        out.append(inputs)
        res = step_model(inputs)
        for i in range(2 * n_layer):
            caches[i][:, :, t : t + 1, :] = res[1 + i]
    return out


def _mamba_state_shapes(step_model):
    """[(conv shape, ssm shape), ...] from the step graph's input
    hints (models/mamba.py mamba_decode_step input order)."""
    hints = [tuple(int(d) for d in v.shape_hint)
             for v in step_model.inputs[1:]]
    return list(zip(hints[0::2], hints[1::2]))


def generate_mamba(step_model, prompt_ids: np.ndarray, wte: np.ndarray,
                   max_new_tokens: int, temperature: float = None,
                   top_k: int = None, top_p: float = None, key=None,
                   min_p: float = None,
                   repetition_penalty: float = None) -> np.ndarray:
    """Autoregressive decode through an SSM decode-step graph
    (models/mamba.py mamba_decode_step): O(1)/token -- the carry is a
    constant-size (conv window, SSM state) pair per layer instead of a
    growing KV cache, swapped in WHOLESALE each step (no positions, no
    masks, no dynamic_update_slice). The whole loop is ONE compiled XLA
    program; sampling knobs as in :func:`generate`."""
    prompt_ids = np.asarray(prompt_ids)
    batch, t0 = prompt_ids.shape
    shapes = _mamba_state_shapes(step_model)
    wte_j = _placed_table(step_model, "wte", wte)
    fwd = step_model.lowered_fn()
    if key is None:
        key = jax.random.PRNGKey(0)
    total = t0 + max_new_tokens
    sampling = (temperature is not None or top_k is not None
                or top_p is not None or min_p is not None)

    def run(prompt, params, wte_j, key):
        def body(t, carry):
            ids, states, key = carry
            tok = jnp.take(ids, t, axis=1)
            x = jnp.take(wte_j, tok, axis=0)[:, None, :]
            flat = [s for pair in states for s in pair]
            outs = fwd([x] + flat, params)
            row = outs[0][:, 0, :]
            if sampling:
                key, sub = jax.random.split(key)
            else:
                sub = key
            presence = None
            if repetition_penalty is not None:
                valid = (jnp.arange(ids.shape[1])[None, :]
                         <= t).astype(jnp.float32)
                presence = jnp.zeros(row.shape, jnp.float32).at[
                    jnp.arange(ids.shape[0])[:, None], ids].max(valid)
            nxt = _next_token(row, temperature, top_k, top_p, sub,
                              min_p, presence, repetition_penalty)
            states = tuple((outs[1 + 2 * i], outs[2 + 2 * i])
                           for i in range(len(states)))
            cand = jax.lax.dynamic_update_slice_in_dim(ids, nxt[:, None],
                                                       t + 1, axis=1)
            ids = jnp.where(t + 1 >= t0, cand, ids)
            return ids, states, key

        ids = jnp.zeros((batch, total), jnp.int32).at[:, :t0].set(prompt)
        states = tuple((jnp.zeros(cs, jnp.float32),
                        jnp.zeros(ss, jnp.float32)) for cs, ss in shapes)
        ids, _, _ = jax.lax.fori_loop(0, total - 1, body,
                                      (ids, states, key))
        return ids

    ck = ("generate_mamba", batch, t0, int(max_new_tokens),
          temperature, top_k, top_p, min_p, repetition_penalty,
          bool(jax.config.jax_enable_x64))
    run_jit = step_model._jit_cache.setdefault(ck, jax.jit(run))
    return np.asarray(run_jit(jnp.asarray(prompt_ids, jnp.int32),
                              step_model._placed_params(), wte_j, key))


def mamba_decode_calibration(step_model, prompt_ids: np.ndarray,
                             wte: np.ndarray) -> list:
    """Teacher-forced replay of ``prompt_ids`` through the float SSM
    decode step; returns one input-list per step (the state-carry
    analogue of :func:`decode_calibration`)."""
    prompt_ids = np.asarray(prompt_ids)
    batch, t0 = prompt_ids.shape
    shapes = _mamba_state_shapes(step_model)
    states = [np.zeros(s, np.float32)
              for pair in shapes for s in pair]
    out = []
    for t in range(t0):
        x = wte[prompt_ids[:, t]][:, None, :].astype(np.float32)
        inputs = [x] + [s.copy() for s in states]
        out.append(inputs)
        res = step_model(inputs)
        states = [np.asarray(r) for r in res[1:]]
    return out
