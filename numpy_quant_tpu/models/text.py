"""Text-encoder (BERT-style) ONNX graph generator.

A second transformer domain beside the ViT family: int64 token-id
inputs, Gather-based embedding lookup, POST-LayerNorm encoder layers
(HF Bert), tanh pooler. Exercises the shape-domain input path (int64
graph inputs ride host ITensors and stay static under jit) and the
same attention-fusion pattern as ViT -- the head-split kernel fuses
these graphs unchanged.

Like models/vit.py, graphs are lowered from LIVE transformers modules
with this package's builder (the environment has no ``onnx`` package /
torch exporter), emitting the exporter's node patterns, and every
generated graph is verified against the module's own torch forward in
tests (reference test strategy, SURVEY.md §4).
"""
from __future__ import annotations

import numpy as np

from ..onnx.builder import GraphBuilder
from .. import onnx as O
from .vit import _ViTEmitter, _np


def _bert_encoder_layer(e: _ViTEmitter, x: str, layer, name: str) -> str:
    """HF BertLayer: POST-LN -- attention -> Add+LN -> GELU MLP ->
    Add+LN (ViT's layers are pre-LN; the emitter helpers are shared)."""
    g = e.g
    ctx = e.self_attention(x, layer.attention.self, f"{name}.attention")
    att = e.linear3d(ctx, layer.attention.output.dense,
                     f"{name}.attention.output")
    res1 = g.node("Add", [att, x], out=f"{name}/residual1")
    x1 = e.layernorm(res1, layer.attention.output.LayerNorm,
                     f"{name}.attention.ln")
    inter = e.linear3d(x1, layer.intermediate.dense, f"{name}.intermediate")
    act = e.gelu(inter, f"{name}.gelu")
    out = e.linear3d(act, layer.output.dense, f"{name}.output")
    res2 = g.node("Add", [out, x1], out=f"{name}/residual2")
    return e.layernorm(res2, layer.output.LayerNorm, f"{name}.ln")


def bert_text_classifier(config=None, batch_size: int = 4,
                         seq_len: int = 16, seed: int = 0) -> O.ModelProto:
    """BertForSequenceClassification over int64 ``input_ids``
    [batch, seq] (full attention, all-ones mask, zero token types --
    their embedding row folds into the position table at build time).
    The live module rides on ``model._torch_module`` for oracle
    forwards."""
    import torch
    from transformers import BertConfig
    from transformers.models.bert.modeling_bert import (
        BertForSequenceClassification)

    torch.manual_seed(seed)
    if config is None:
        config = BertConfig(vocab_size=96, hidden_size=32,
                            num_hidden_layers=2, num_attention_heads=2,
                            intermediate_size=64,
                            max_position_embeddings=seq_len,
                            num_labels=4, hidden_act="gelu")
    config.attn_implementation = "eager"
    assert config.hidden_act in ("gelu", "gelu_new"), config.hidden_act
    module = BertForSequenceClassification(config).eval()
    emb = module.bert.embeddings

    g = GraphBuilder("bert_text_classifier")
    e = _ViTEmitter(g)
    ids = g.input("input_ids", [batch_size, seq_len],
                  elem_type=O.TensorProto.INT64)

    # word lookup: Gather over the embedding table (int64 ids are
    # shape-domain host tensors, so the gather is static under jit)
    table = g.init("embeddings.word_embeddings.weight",
                   _np(emb.word_embeddings.weight))
    h = g.node("Gather", [table, ids], out="/word_emb", axis=0)
    # position [0..seq) + all-zero token-type rows, folded into ONE
    # additive [seq, hidden] constant (broadcasts over the batch)
    pos = _np(emb.position_embeddings.weight)[:seq_len]
    pos = pos + _np(emb.token_type_embeddings.weight)[0][None, :]
    padd = g.init("embeddings.position_plus_type", pos)
    h = g.node("Add", [h, padd], out="/emb_sum")
    h = e.layernorm(h, emb.LayerNorm, "embeddings.ln")

    for i, layer in enumerate(module.bert.encoder.layer):
        h = _bert_encoder_layer(e, h, layer, f"encoder.layer.{i}")

    # pooler: first token -> dense -> Tanh; then the classifier head
    i0 = g.const(np.array(0, dtype=np.int64), "idx0")
    first = g.node("Gather", [h, i0], out="/first_token", axis=1)
    pooled = e.linear2d(first, module.bert.pooler.dense, "pooler.dense")
    pooled = g.node("Tanh", [pooled], out="/pooled")
    logits = e.linear2d(pooled, module.classifier, "classifier")
    g.node("Identity", [logits], out="logits", name="out_identity")
    g.output("logits", [batch_size, config.num_labels])
    model = g.model()
    model._torch_module = module
    return model
