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


def generate(model, prompt_ids: np.ndarray, wte: np.ndarray,
             max_new_tokens: int, temperature: float = None,
             key=None) -> np.ndarray:
    """Generate ``max_new_tokens`` continuations of ``prompt_ids``
    [B, T0] with ``model`` (any Model/QModel over an inputs_embeds
    causal graph) and the token-embedding table ``wte`` [V, H].

    Greedy argmax by default; pass ``temperature`` (and optionally a
    PRNG ``key``) for sampling. Returns [B, T0 + max_new_tokens] int
    ids. T0 + max_new_tokens must fit the graph's fixed length L; the
    causal mask guarantees the padded tail never influences live
    positions.
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

    wte_j = jnp.asarray(wte, jnp.float32)
    fwd = model.lowered_fn()
    params = model._placed_params()
    if key is None:
        key = jax.random.PRNGKey(0)

    def body(i, carry):
        embeds, ids, key = carry
        t = t0 - 1 + i  # position whose logits predict token t+1
        logits = fwd([embeds], params)[0]
        row = jax.lax.dynamic_slice_in_dim(logits, t, 1, axis=1)[:, 0, :]
        if temperature is None:
            nxt = jnp.argmax(row, axis=-1).astype(jnp.int32)
        else:
            key, sub = jax.random.split(key)
            nxt = jax.random.categorical(
                sub, row / jnp.float32(temperature), axis=-1
            ).astype(jnp.int32)
        embeds = jax.lax.dynamic_update_slice_in_dim(
            embeds, jnp.take(wte_j, nxt, axis=0)[:, None, :], t + 1, axis=1)
        ids = jax.lax.dynamic_update_slice_in_dim(
            ids, nxt[:, None], t + 1, axis=1)
        return embeds, ids, key

    @jax.jit
    def run(prompt):
        embeds = jnp.zeros((batch, length, wte_j.shape[1]), jnp.float32)
        embeds = embeds.at[:, :t0, :].set(jnp.take(wte_j, prompt, axis=0))
        ids = jnp.zeros((batch, length), jnp.int32)
        ids = ids.at[:, :t0].set(prompt)
        embeds, ids, _ = jax.lax.fori_loop(
            0, max_new_tokens, body, (embeds, ids, key))
        return ids

    out = run(jnp.asarray(prompt_ids, jnp.int32))
    return np.asarray(out)[:, : t0 + max_new_tokens]
