"""BERT-style text classifier zoo entry (models/text.py): int64 token
ids, Gather embeddings, post-LN encoder -- verified against the live
transformers module's torch forward, quantized end-to-end, and fused
by the same head-split attention kernel as ViT.
"""
import numpy as np
import pytest

import numpy_quant_tpu as nq
from numpy_quant_tpu.models.text import bert_text_classifier

RNG = np.random.default_rng(61)


def _logits_torch(module, ids):
    import torch

    with torch.no_grad():
        return module(input_ids=torch.from_numpy(ids)).logits.numpy()


def test_bert_float_matches_torch():
    m = bert_text_classifier(batch_size=4, seq_len=16, seed=0)
    ids = RNG.integers(0, 96, size=(4, 16)).astype(np.int64)
    model = nq.Model.from_onnx(m)
    got = model([ids])[0]
    want = _logits_torch(m._torch_module, ids)
    np.testing.assert_allclose(got, want, atol=2e-4), \
        np.abs(got - want).max()


def test_bert_quantized_and_fused():
    """int8 quantization over the int64-input graph: label agreement
    with float, and fuse_attention converts every layer's Softmax to
    the head-split kernel bit-identically."""
    m = bert_text_classifier(batch_size=8, seq_len=16, seed=1)
    ids = RNG.integers(0, 96, size=(8, 16)).astype(np.int64)
    model = nq.Model.from_onnx(m)
    f_out = model([ids])[0]

    q = model.quantize([ids], bit_width=8)
    base = q([ids])[0]
    assert np.array_equal(base.argmax(-1), f_out.argmax(-1))

    rep = q.optimize()
    assert rep["fuse_attention"] == 2  # one per encoder layer
    assert rep["fusion_failures"] == []
    np.testing.assert_array_equal(q([ids])[0], base)

    # the serving transforms compose on the text domain too
    assert q.pack_weights() > 0
    np.testing.assert_array_equal(q([ids])[0], base)
