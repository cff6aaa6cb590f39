"""Continuous batching: slot-based online decode serving.

``utils.generate.generate_kv`` runs ONE batch lockstep -- every row
starts together and decodes the same number of steps. Production
serving is different: requests arrive continuously with different
prompt lengths and budgets, and a finished row's slot should go to the
next request immediately instead of idling until the whole batch
drains. That is continuous batching (Orca, OSDI'22; vLLM's serving
loop), and this module implements it TPU-natively:

* ONE compiled XLA step program for all B slots, reused for the whole
  engine lifetime (static shapes: [B, L] caches, [B] per-slot
  positions). No recompilation on admission/retirement.
* PER-SLOT positions: each slot carries its own decode position t_b,
  prompt length and budget. The embedding gather, additive mask,
  RoPE rows, T5 bias rows and cache updates are all per-row
  (``take_along_axis`` + vmapped ``dynamic_update_slice`` instead of
  the lockstep scalar t).
* Prefill by teacher forcing: an admitted prompt is written into the
  slot's id buffer and replayed one token per step (the same
  teacher-forcing rule generate_kv applies batch-wide), so prefill and
  decode share the single step program. Slots in prefill and slots in
  decode coexist in the same XLA call.
* Admission/retirement are tiny host-side ``.at[slot].set`` updates of
  the device-resident state between steps; the KV caches never need
  clearing (a new request's mask only ever validates positions its own
  steps have already written).
* PAGED KV cache (``paged_kv=(block_size, n_blocks)``): instead of a
  dense ``[B, H, L, D]`` cache per slot, all slots share one block pool
  ``[n_blocks, H, block_size, D]`` per layer plus a per-slot block
  table (vLLM, SOSP'23 -- the TPU-native form: the step program
  gathers each slot's table into a contiguous view for attention and
  scatters the new K/V row into its block, all inside the one compiled
  step). Blocks are allocated on demand as a request's position
  crosses block boundaries and freed at retirement, so HBM holds
  ragged ACTUAL lengths instead of B x max_len worst cases; when the
  pool runs dry mid-decode the youngest request is preempted by
  recompute (tokens so far re-queued as its prompt -- greedy decode is
  exactly preserved).

Works with every decode-step layout ``generate_kv`` supports: plain
(models/gpt.py), RoPE (models/llama.py, per-row cos/sin rows), T5
score-bias rows, and seq2seq ``memory`` (per-slot encoder rows,
models/whisper.py / seq2seq.py / t5.py), float or int8-quantized step
models. Decode is greedy per slot by default; ``submit(...,
temperature=)`` switches THAT request to categorical sampling
(per-slot, so greedy and sampled requests co-batch in one step
program; deterministic under the engine's ``key=``).

The reference framework has no serving surface at all (single
``__call__``, reference model.py:294) -- this is parity-plus, the
online half of the serving story next to ``Model.serve_stream``'s
pipelined offline scan.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class _Request:
    req_id: int
    prompt: np.ndarray          # [plen] int32
    max_new_tokens: int
    memory_row: np.ndarray = None
    temperature: float = 0.0    # 0 = greedy


@dataclass
class _SlotInfo:
    req_id: int
    plen: int
    max_new: int
    req: "_Request" = None      # original request (preemption rebuilds)


class ContinuousBatcher:
    """Online serving engine over a KV-cache decode-step model.

    ``step_model`` is a decode-step graph (gpt_decode_step,
    llama_decode_step, t5_decode_step, ...) built with ``batch_size``
    slots and cache length ``max_len``; ``wte``/``wpe``/``rope``/
    ``score_bias``/``has_memory``/``kv_cache_dtype`` mirror
    :func:`generate_kv`'s layout arguments (``kv_cache_dtype="int8"``
    stores the slot caches int8 on quantized step models, bit-identical
    tokens). ``eos_id`` retires a slot early when generated.
    ``prefill_model`` (models/gpt.py gpt_prefill: the full-sequence
    graph with per-layer present outputs) admits each request with ONE
    MXU-shaped call over its whole prompt instead of O(plen)
    teacher-forced steps -- prompts longer than the prefill length fall
    back to teacher forcing.

    Use :meth:`submit` to enqueue requests, :meth:`step` to advance
    every active slot one token (admitting queued requests into free
    slots first), or :meth:`run` to drain a whole workload. Results are
    token rows INCLUDING the prompt (and the EOS, when hit), exactly
    what generate_kv returns for the same prompt/budget.
    """

    def __init__(self, step_model, wte: np.ndarray, wpe: np.ndarray = None,
                 rope=None, score_bias: np.ndarray = None,
                 has_memory: bool = False, eos_id: int = None,
                 kv_cache_dtype: str = None, prefill_model=None,
                 state_carry: bool = False, max_len: int = None,
                 paged_kv: tuple = None, key=None,
                 steps_per_sync: int = 1):
        self.model = step_model
        self.eos_id = eos_id
        # steps_per_sync > 1 amortizes the per-step host round trip
        # (the online-admission price: one dispatch + done-mask pull per
        # token) over k inner decode steps compiled into ONE program:
        # a slot that finishes mid-chunk freezes (its inner active mask
        # drops), so tokens are identical to lockstep stepping; the
        # tradeoffs are admission latency (free slots refill only at
        # chunk boundaries) and up to k-1 wasted masked steps per
        # retirement. On a remote-attached chip the sync costs ~26 ms
        # per step, so k=8 is ~8x engine throughput (BENCH_HISTORY
        # round 4); on a locally-attached host the sync is ~0.1 ms and
        # k=1 keeps admission latency minimal.
        self._chunk = max(1, int(steps_per_sync))
        self._base_key = (jax.random.PRNGKey(0) if key is None else key)
        self._state_carry = bool(state_carry)
        if state_carry:
            # SSM layout (models/mamba.py mamba_decode_step): x_step +
            # per-layer (conv window, recurrent state) swapped wholesale
            # -- no masks, no positions, constant-size carry. max_len
            # only bounds the ids buffer / budgets.
            if (wpe is not None or rope is not None
                    or score_bias is not None or has_memory
                    or kv_cache_dtype is not None
                    or prefill_model is not None):
                raise ValueError("state_carry engines take none of "
                                 "wpe/rope/score_bias/memory/"
                                 "kv_cache_dtype/prefill_model")
            if max_len is None:
                raise ValueError("state_carry engines need max_len= "
                                 "(there is no cache to infer it from)")
            from .generate import _mamba_state_shapes
            self._state_shapes = _mamba_state_shapes(step_model)
            n_layer = len(self._state_shapes)
            self.n_slots = int(self._state_shapes[0][0][0])
            self.max_len = int(max_len)
            cache_start = 1
        else:
            cache_start = (2 if rope is None else 4) \
                + (0 if score_bias is None else 1) \
                + (0 if not has_memory else 1)
            n_layer = (len(step_model.inputs) - cache_start) // 2
            b, nh, length, hd = step_model.inputs[cache_start].shape_hint
            self.n_slots, self.max_len = int(b), int(length)
            self._layout = (n_layer, int(nh), int(hd))
        # device-resident tables, re-resolved through the model's
        # _placed_table cache before every dispatch: a resolve is an
        # ``is`` check when nothing changed, and shard_model() (which
        # pops the cache) after construction re-places them onto the
        # mesh instead of leaving stale single-device-committed arrays
        self._table_srcs = (wte, wpe, rope, score_bias)
        self._resolve_tables()
        if has_memory:
            mem_hint = step_model.inputs[cache_start - 1].shape_hint
            self._memory = jnp.zeros(tuple(int(d) for d in mem_hint),
                                     jnp.float32)
        else:
            self._memory = None

        # int8 cache storage (4x less KV HBM), generate_kv's contract:
        # presents quantize with THEIR cache input's calibrated params,
        # idempotent -> bit-identical to the float-carry run
        if state_carry:
            kv_cache_dtype = None
        if kv_cache_dtype is None:
            self._cache_qps = [None] * (2 * n_layer)
            cache_dtype = jnp.float32
        elif kv_cache_dtype == "int8":
            qp_map = getattr(step_model, "quant_params", None)
            if qp_map is None:
                raise ValueError("kv_cache_dtype='int8' needs a "
                                 "quantized step model")
            self._cache_qps = [qp_map[v.name]
                               for v in step_model.inputs[cache_start:]]
            cache_dtype = jnp.int8
        else:
            raise ValueError(f"kv_cache_dtype {kv_cache_dtype!r} not in "
                             "(None, 'int8')")

        # device-resident engine state
        B, L = self.n_slots, self.max_len
        self._ids = jnp.zeros((B, L + 1), jnp.int32)
        self._pos = jnp.zeros((B,), jnp.int32)
        self._plen = jnp.zeros((B,), jnp.int32)   # prompt length
        self._tmax = jnp.zeros((B,), jnp.int32)   # plen + max_new
        self._active = jnp.zeros((B,), jnp.bool_)
        self._temp = jnp.zeros((B,), jnp.float32)  # 0 = greedy
        self._paged = None
        if paged_kv is not None:
            if state_carry:
                raise ValueError("paged_kv applies to KV-cache engines "
                                 "only (state_carry caches are already "
                                 "constant-size)")
            blk, n_blocks = int(paged_kv[0]), int(paged_kv[1])
            if blk < 1 or n_blocks < 2:
                raise ValueError("paged_kv needs block_size >= 1 and "
                                 "n_blocks >= 2 (block 0 is the null "
                                 "sink for inactive rows)")
            nbt = -(-L // blk)  # table entries per slot
            self._paged = (blk, n_blocks, nbt)
            # block 0 is never allocated: unallocated table entries and
            # inactive slots read/write it, masked out of attention
            self._table = jnp.zeros((B, nbt), jnp.int32)
            self._free = list(range(n_blocks - 1, 0, -1))
            self._owned: list[list[int]] = [[] for _ in range(B)]
        if state_carry:
            self._caches = tuple(
                (jnp.zeros(cs, jnp.float32), jnp.zeros(ss, jnp.float32))
                for cs, ss in self._state_shapes)
        elif self._paged is not None:
            blk, n_blocks, _ = self._paged
            zeros = jnp.zeros((n_blocks, self._layout[1], blk,
                               self._layout[2]), jnp.float32)
            self._caches = tuple(
                (self._q_cache(zeros, 2 * i).astype(cache_dtype),
                 self._q_cache(zeros, 2 * i + 1).astype(cache_dtype))
                for i in range(n_layer))
        else:
            zeros = jnp.zeros((B, self._layout[1], L, self._layout[2]),
                              jnp.float32)
            self._caches = tuple(
                (self._q_cache(zeros, 2 * i).astype(cache_dtype),
                 self._q_cache(zeros, 2 * i + 1).astype(cache_dtype))
                for i in range(n_layer))

        # prefill fast path: one MXU-shaped call per admission instead
        # of O(plen) teacher-forced steps (models/gpt.py gpt_prefill)
        self._prefill = prefill_model
        if prefill_model is not None:
            # RoPE engines work too: the prefill graph bakes its own
            # positions 0..P-1, exactly right at admission time
            if score_bias is not None or has_memory:
                raise ValueError("prefill_model currently supports the "
                                 "plain and RoPE decode layouts only")
            pb, plen_hint, _ = prefill_model.inputs[0].shape_hint
            if int(pb) != 1:
                raise ValueError("prefill graphs admit one request at a "
                                 "time (batch 1)")
            self.prefill_len = int(plen_hint)
            if self.prefill_len > L:
                raise ValueError(f"prefill length {self.prefill_len} "
                                 f"exceeds the cache length {L}")
            pf = prefill_model.lowered_fn()
            self._prefill_fn = jax.jit(
                lambda emb, params: pf([emb], params))
        else:
            self.prefill_len = 0

        # host-side bookkeeping
        self._queue: list[_Request] = []
        self._slots: list[_SlotInfo | None] = [None] * B
        self._next_id = 0
        self._early: list[tuple[int, np.ndarray]] = []
        self.stats = {"steps": 0, "slot_steps": 0, "prefills": 0,
                      "completed": 0, "tokens_out": 0, "preemptions": 0}
        self._fwd = step_model.lowered_fn()
        self._step_fn = jax.jit(self._build_step())

    # ---------------------------------------------------------- step fn

    def _resolve_tables(self) -> None:
        """(Re-)place the embedding/RoPE/bias tables through the step
        model's ``_placed_table`` cache -- an ``is`` check per table
        when nothing changed, a fresh mesh-replicated placement after
        ``shard_model`` popped the cache."""
        from .generate import _placed_table
        wte, wpe, rope, score_bias = self._table_srcs
        self._wte = _placed_table(self.model, "wte", wte)
        self._wpe = _placed_table(self.model, "wpe", wpe)
        if rope is not None:
            self._cos = _placed_table(self.model, "rope_cos",
                                      rope[0])  # [1,1,L,D]
            self._sin = _placed_table(self.model, "rope_sin", rope[1])
        else:
            self._cos = self._sin = None
        self._bias = _placed_table(self.model, "score_bias",
                                   score_bias)  # [L,H,L+1]

    def _q_cache(self, x, idx: int):
        qp = self._cache_qps[idx]
        if qp is None:
            return x
        from ..quantization import quantize as _quantize
        return _quantize(x, self.model.bit_width, qp.scale,
                         qp.zero_point).astype(jnp.int8)

    def _build_step(self):
        L = self.max_len
        eos = self.eos_id
        has_rope = self._cos is not None
        has_bias = self._bias is not None
        has_mem = self._memory is not None
        state_carry = self._state_carry
        paged = self._paged
        if paged is not None:
            nh, hd = self._layout[1], self._layout[2]
        fwd = self._fwd

        def pick(row, temp, key):
            """Per-slot next token: categorical at the slot's
            temperature, argmax where temperature is 0 (greedy)."""
            greedy = jnp.argmax(row, axis=-1).astype(jnp.int32)
            scaled = row / jnp.maximum(temp, jnp.float32(1e-6))[:, None]
            sampled = jax.random.categorical(key, scaled,
                                             axis=-1).astype(jnp.int32)
            return jnp.where(temp > 0, sampled, greedy)

        def step(ids, pos, plen, tmax, active, caches, table, params,
                 wte, wpe, cos, sin, bias, mem, temp, key):
            B = ids.shape[0]
            rows = jnp.arange(B)
            tok = jnp.take_along_axis(ids, pos[:, None], axis=1)[:, 0]
            x = jnp.take(wte, tok, axis=0)
            if wpe is not None:
                x = x + jnp.take(wpe, pos, axis=0)
            x = x[:, None, :]
            # per-row additive mask: position j valid iff j < pos_b,
            # plus the always-valid self column
            valid = jnp.arange(L)[None, :] < pos[:, None]
            mask = jnp.where(valid, jnp.float32(0), jnp.float32(-1e9))
            mask = jnp.concatenate(
                [mask, jnp.zeros((B, 1), jnp.float32)], axis=1)
            mask = mask[:, None, None, :]
            extra = []
            if has_rope:
                # [1,1,L,D] tables -> per-row [B,1,1,D] rows
                extra = [jnp.take(cos[0, 0], pos, axis=0)[:, None, None, :],
                         jnp.take(sin[0, 0], pos, axis=0)[:, None, None, :]]
            if has_bias:
                # [L,H,L+1] table -> per-row [B,H,1,L+1] rows
                extra = extra + [jnp.take(bias, pos, axis=0)[:, :, None, :]]
            if has_mem:
                extra = extra + [mem]
            if paged is not None:
                # pool [nB, H, blk, D] + table [B, nbt] -> the slot's
                # contiguous [B, H, L, D] attention view (one gather,
                # fused into the step program)
                blk_sz, _, nbt = paged

                def view(pool):
                    g = jnp.take(pool, table, axis=0)   # [B,nbt,H,blk,D]
                    g = jnp.moveaxis(g, 2, 1)           # [B,H,nbt,blk,D]
                    g = g.reshape(B, nh, nbt * blk_sz, hd)
                    return g[:, :, :L]
                flat = [view(c) for pair in caches for c in pair]
            else:
                flat = [c for pair in caches for c in pair]
            if state_carry:
                # SSM: no mask; the state swaps in wholesale. Inactive
                # rows evolve garbage that admission re-zeroes.
                outs = fwd([x] + flat, params)
                nxt = pick(outs[0][:, 0, :], temp, key)
                caches = tuple((outs[1 + 2 * i], outs[2 + 2 * i])
                               for i in range(len(caches)))
            elif paged is not None:
                outs = fwd([x, mask] + extra + flat, params)
                nxt = pick(outs[0][:, 0, :], temp, key)
                # scatter each slot's new K/V row into its current
                # block (inactive slots' tables point at null block 0)
                blk_sz = paged[0]
                wblk = jnp.take_along_axis(table, (pos // blk_sz)[:, None],
                                           axis=1)[:, 0]
                off = pos % blk_sz

                def put_pool(pool, present, idx):
                    row = self._q_cache(present, idx).astype(
                        pool.dtype)[:, :, 0, :]          # [B, H, D]
                    return pool.at[wblk, :, off].set(row)
                caches = tuple(
                    (put_pool(k, outs[1 + 2 * i], 2 * i),
                     put_pool(v, outs[2 + 2 * i], 2 * i + 1))
                    for i, (k, v) in enumerate(caches))
            else:
                outs = fwd([x, mask] + extra + flat, params)
                nxt = pick(outs[0][:, 0, :], temp, key)

                def put(cache, present, p):
                    return jax.lax.dynamic_update_slice_in_dim(
                        cache, present, p, axis=1)
                vput = jax.vmap(put)  # per-row positions
                caches = tuple(
                    (vput(k, self._q_cache(outs[1 + 2 * i], 2 * i)
                          .astype(k.dtype), pos),
                     vput(v, self._q_cache(outs[2 + 2 * i], 2 * i + 1)
                          .astype(v.dtype), pos))
                    for i, (k, v) in enumerate(caches))

            # teacher forcing: inside the prompt the next token is given
            in_prompt = pos + 1 < plen
            cand = ids.at[rows, pos + 1].set(nxt)
            ids = jnp.where(active[:, None] & ~in_prompt[:, None],
                            cand, ids)
            new_pos = jnp.where(active, pos + 1, pos)
            emitted = jnp.take_along_axis(ids, new_pos[:, None],
                                          axis=1)[:, 0]
            done = active & (new_pos + 1 >= tmax)
            if eos is not None:
                done = done | (active & ~in_prompt & (emitted == eos))
            return ids, new_pos, done, caches

        if self._chunk == 1:
            return step
        chunk = self._chunk

        def chunked(ids, pos, plen, tmax, active, caches, table, params,
                    wte, wpe, cos, sin, bias, mem, temp, key):
            """k inner decode steps in ONE program: a slot drops out
            of the inner active mask the step it finishes, so its
            ids/pos freeze exactly as they would under lockstep
            stepping (bit-identical results, fewer host syncs).

            ``key`` is ``(base_key, step0)``: inner step ``i`` folds
            the ABSOLUTE step index ``step0 + i`` into the base key --
            the same ``fold_in(base, global_step)`` the k=1 engine
            uses -- so temperature-sampled tokens are bit-identical to
            lockstep stepping too, not just greedy ones."""
            base_key, step0 = key

            def body(i, carry):
                ids, pos, act, done_acc, caches, nact = carry
                nact = nact + jnp.sum(act.astype(jnp.int32)) \
                    .astype(jnp.int32)
                ids, pos, done, caches = step(
                    ids, pos, plen, tmax, act, caches, table, params,
                    wte, wpe, cos, sin, bias, mem, temp,
                    jax.random.fold_in(base_key, step0 + i))
                return (ids, pos, act & ~done, done_acc | done, caches,
                        nact)

            done0 = jnp.zeros_like(active)
            ids, pos, _, done, caches, nact = jax.lax.fori_loop(
                0, chunk, body,
                (ids, pos, active, done0, caches, jnp.int32(0)))
            return ids, pos, done, caches, nact

        return chunked

    # ------------------------------------------------- paged block pool

    def _alloc_upto(self, slot: int, n_entries: int) -> bool:
        """Ensure the slot's first ``n_entries`` block-table entries are
        allocated; False when the free list cannot cover them."""
        need = n_entries - len(self._owned[slot])
        if need <= 0:
            return True
        if len(self._free) < need:
            return False
        for _ in range(need):
            b = self._free.pop()
            idx = len(self._owned[slot])
            self._owned[slot].append(b)
            self._table = self._table.at[slot, idx].set(b)
        return True

    def _release_blocks(self, slot: int) -> None:
        if self._paged is None or not self._owned[slot]:
            return
        self._free.extend(reversed(self._owned[slot]))
        self._owned[slot] = []
        self._table = self._table.at[slot].set(0)

    def _preempt_youngest(self) -> None:
        """Recompute-style preemption (vLLM): re-queue the youngest
        active request with its tokens-so-far as the prompt, free its
        blocks. Greedy decode replays to exactly the same tokens."""
        cand = [s for s in range(self.n_slots) if self._slots[s] is not None]
        if not cand:
            raise RuntimeError("paged KV pool exhausted with nothing "
                               "to preempt")
        slot = max(cand, key=lambda s: self._slots[s].req_id)
        info = self._slots[slot]
        pos_h = int(np.asarray(self._pos[slot]))
        known = max(info.plen, pos_h + 1)   # prompt + generated so far
        toks = np.asarray(self._ids[slot, :known]).astype(np.int32)
        tmax = info.plen + info.max_new
        req0 = info.req
        self._queue.insert(0, _Request(
            info.req_id, toks, tmax - known,
            req0.memory_row if req0 is not None else None,
            req0.temperature if req0 is not None else 0.0))
        self._release_blocks(slot)
        self._slots[slot] = None
        self._active = self._active.at[slot].set(False)
        self.stats["preemptions"] += 1

    def _ensure_blocks(self) -> None:
        """Before a step, every active slot must own the blocks its
        next ``steps_per_sync`` write positions land in (the chunked
        program advances without host allocation); preempt the youngest
        request until the pool covers the rest."""
        blk = self._paged[0]
        while True:
            pos_h = np.asarray(self._pos)
            ok = True
            for slot in range(self.n_slots):
                if self._slots[slot] is None:
                    continue
                last = int(pos_h[slot]) + self._chunk - 1
                if not self._alloc_upto(slot, last // blk + 1):
                    ok = False
                    break
            if ok:
                return
            self._preempt_youngest()

    # ------------------------------------------------------ public API

    def reset(self) -> None:
        """Drop all queued and in-flight requests (state zeroes; the
        compiled step/prefill programs are kept). New submissions start
        fresh -- slot caches need no clearing (masks only ever validate
        positions a request itself wrote)."""
        self._queue = []
        self._early = []
        self._slots = [None] * self.n_slots
        self._active = jnp.zeros((self.n_slots,), jnp.bool_)
        if self._paged is not None:
            for slot in range(self.n_slots):
                self._release_blocks(slot)
        self.stats = {k: 0 for k in self.stats}

    def submit(self, prompt_ids, max_new_tokens: int,
               memory_row: np.ndarray = None,
               temperature: float = None) -> int:
        """Enqueue a request; returns its id. ``prompt_ids`` is a 1-D
        token array; ``memory_row`` ([S, d]) is that request's encoder
        output for seq2seq step models; ``temperature`` switches THIS
        request to categorical sampling (greedy when None/0 --
        per-slot, so sampling and greedy requests co-batch; seeded by
        the engine's ``key=``)."""
        prompt = np.asarray(prompt_ids, np.int32).reshape(-1)
        if prompt.size < 1:
            raise ValueError("empty prompt")
        if max_new_tokens < 1:
            raise ValueError("max_new_tokens must be >= 1")
        if prompt.size + max_new_tokens > self.max_len + 1:
            raise ValueError(
                f"prompt {prompt.size} + {max_new_tokens} new tokens "
                f"exceeds the engine's cache length {self.max_len}")
        if (memory_row is None) != (self._memory is None):
            raise ValueError("memory_row must be passed iff the step "
                             "model takes encoder memory")
        if self._paged is not None:
            blk, n_blocks, _ = self._paged
            need = -(-(prompt.size + max_new_tokens - 1) // blk)
            if need > n_blocks - 1:
                raise ValueError(
                    f"request needs {need} KV blocks but the pool has "
                    f"{n_blocks - 1} allocatable (block_size {blk})")
        req = _Request(self._next_id, prompt, int(max_new_tokens),
                       memory_row, float(temperature or 0.0))
        self._next_id += 1
        self._queue.append(req)
        return req.req_id

    @property
    def n_active(self) -> int:
        return sum(s is not None for s in self._slots)

    @property
    def n_queued(self) -> int:
        return len(self._queue)

    def _admit(self) -> None:
        for slot in range(self.n_slots):
            while self._slots[slot] is None and self._queue:
                if not self._admit_one(slot):
                    return

    def _admit_one(self, slot: int) -> bool:
            req = self._queue.pop(0)
            plen = req.prompt.size
            use_prefill = (self._prefill is not None
                           and plen <= self.prefill_len)
            if self._paged is not None:
                # the rows written at admission must have blocks: the
                # whole prompt under prefill, just row 0 teacher-forced
                blk = self._paged[0]
                entries = -(-plen // blk) if use_prefill else 1
                if not self._alloc_upto(slot, entries):
                    self._queue.insert(0, req)   # pool dry: wait
                    return False
            row = np.zeros(self.max_len + 1, np.int32)
            row[:plen] = req.prompt

            pos0 = 0
            if use_prefill:
                # one MXU call admits the whole prompt: presents land in
                # the slot's cache rows, row plen-1's logits give the
                # first generated token, and decode starts at pos=plen
                emb = np.zeros((1, self.prefill_len, self._wte.shape[1]),
                               np.float32)
                emb[0, :plen] = np.asarray(self._wte)[req.prompt]
                outs = self._prefill_fn(emb,
                                        self._prefill._placed_params())
                logit_row = np.asarray(outs[0][0, plen - 1])
                if req.temperature > 0:
                    k = jax.random.fold_in(self._base_key,
                                           1_000_000
                                           + self.stats["prefills"])
                    tok = int(jax.random.categorical(
                        k, jnp.asarray(logit_row) / req.temperature))
                else:
                    tok = int(logit_row.argmax())
                row[plen] = tok
                P = self.prefill_len
                if self._paged is not None:
                    blk = self._paged[0]
                    nb = -(-plen // blk)
                    blks = jnp.asarray(self._owned[slot][:nb], jnp.int32)

                    def pool_write(pool, present, idx):
                        rows = self._q_cache(present, idx).astype(
                            pool.dtype)[0]            # [H, P, D]
                        tgt = nb * blk
                        if tgt <= rows.shape[1]:
                            rows = rows[:, :tgt]
                        else:
                            rows = jnp.pad(
                                rows, ((0, 0), (0, tgt - rows.shape[1]),
                                       (0, 0)))
                        rows = rows.reshape(rows.shape[0], nb, blk, -1)
                        return pool.at[blks].set(jnp.moveaxis(rows, 1, 0))
                    self._caches = tuple(
                        (pool_write(k, outs[1 + 2 * i], 2 * i),
                         pool_write(v, outs[2 + 2 * i], 2 * i + 1))
                        for i, (k, v) in enumerate(self._caches))
                else:
                    self._caches = tuple(
                        (k.at[slot, :, :P].set(
                            self._q_cache(outs[1 + 2 * i], 2 * i)
                            .astype(k.dtype)[0]),
                         v.at[slot, :, :P].set(
                             self._q_cache(outs[2 + 2 * i], 2 * i + 1)
                             .astype(v.dtype)[0]))
                        for i, (k, v) in enumerate(self._caches))
                pos0 = plen
                self.stats["prefills"] += 1
                done = (req.max_new_tokens <= 1
                        or (self.eos_id is not None
                            and tok == self.eos_id))
                if done:
                    self._release_blocks(slot)
                    self._early.append(
                        (req.req_id, row[: plen + 1].copy()))
                    self.stats["completed"] += 1
                    self.stats["tokens_out"] += 1   # generated tokens
                    return True  # never occupies the slot

            if self._state_carry:
                # unlike KV caches (whose masks hide stale slots), the
                # recurrent state must restart from zero for a new
                # request
                self._caches = tuple(
                    (cs.at[slot].set(0.0), ss.at[slot].set(0.0))
                    for cs, ss in self._caches)
            self._ids = self._ids.at[slot].set(jnp.asarray(row))
            self._pos = self._pos.at[slot].set(pos0)
            self._plen = self._plen.at[slot].set(plen)
            self._tmax = self._tmax.at[slot].set(plen + req.max_new_tokens)
            self._active = self._active.at[slot].set(True)
            self._temp = self._temp.at[slot].set(req.temperature)
            if req.memory_row is not None:
                self._memory = self._memory.at[slot].set(
                    jnp.asarray(req.memory_row, jnp.float32))
            self._slots[slot] = _SlotInfo(req.req_id, plen,
                                          req.max_new_tokens, req)
            return True

    def step(self) -> list[tuple[int, np.ndarray]]:
        """Admit queued requests into free slots, advance every active
        slot one token (ONE compiled XLA call), and return the requests
        that finished this step as ``(req_id, tokens)`` -- tokens
        include the prompt and the EOS when one was generated."""
        self._admit()
        early, self._early = self._early, []
        if self.n_active == 0:
            return sorted(early, key=lambda t: t[0])
        if self._paged is not None:
            self._ensure_blocks()
        self._resolve_tables()
        out = self._step_fn(
            self._ids, self._pos, self._plen, self._tmax, self._active,
            self._caches,
            self._table if self._paged is not None else None,
            self.model._placed_params(), self._wte,
            self._wpe, self._cos, self._sin, self._bias, self._memory,
            self._temp,
            jax.random.fold_in(self._base_key, self.stats["steps"])
            if self._chunk == 1 else
            (self._base_key, jnp.int32(self.stats["steps"])))
        if self._chunk == 1:
            ids, pos, done, caches = out
            n_slot_steps = self.n_active
        else:
            ids, pos, done, caches, nact = out
            n_slot_steps = int(np.asarray(nact))
        self._ids, self._pos, self._caches = ids, pos, caches
        self.stats["steps"] += self._chunk
        self.stats["slot_steps"] += n_slot_steps
        finished = early
        done_h = np.asarray(done)
        if done_h.any():
            ids_h = np.asarray(ids)
            pos_h = np.asarray(pos)
            for slot in np.flatnonzero(done_h):
                info = self._slots[slot]
                finished.append(
                    (info.req_id, ids_h[slot, : pos_h[slot] + 1].copy()))
                self.stats["completed"] += 1
                self.stats["tokens_out"] += pos_h[slot] + 1 - info.plen
                self._release_blocks(slot)
                self._slots[slot] = None
                self._active = self._active.at[slot].set(False)
        finished.sort(key=lambda t: t[0])
        return finished

    def run(self, requests) -> dict[int, np.ndarray]:
        """Drain a workload: submit every (prompt_ids, max_new_tokens)
        (or (prompt_ids, max_new_tokens, memory_row)) tuple, then step
        until all requests finish. Returns {req_id: tokens}."""
        out: dict[int, np.ndarray] = {}
        for req in requests:
            self.submit(*req)
        while self._queue or self.n_active:
            for req_id, tokens in self.step():
                out[req_id] = tokens
        return out
