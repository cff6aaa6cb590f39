"""CLIP-style dual encoder (models/clip.py): vision+text contrastive
graph verified against the live transformers CLIPModel, attention
fusion on both towers, and int8 PTQ retrieval agreement.
"""
import numpy as np
import pytest

import numpy_quant_tpu as nq
from numpy_quant_tpu.models.clip import clip_dual_encoder

RNG = np.random.default_rng(59)


@pytest.fixture(scope="module")
def clip():
    m = clip_dual_encoder(batch_images=2, batch_texts=3, seq_len=8,
                          seed=0)
    return m, nq.Model.from_onnx(m)


def _inputs(proto):
    px = RNG.normal(size=(2, 3, 16, 16)).astype(np.float32)
    eos = proto._torch_module.config.text_config.eos_token_id
    ids = RNG.integers(3, eos, size=(3, 8)).astype(np.int64)
    ids[:, -1] = eos  # pooling contract: EOS at the last position
    emb = (proto._wte[ids] + proto._wpe[np.arange(8)]).astype(np.float32)
    return px, ids, emb


def test_clip_matches_torch(clip):
    import torch

    proto, model = clip
    px, ids, emb = _inputs(proto)
    logits, img, txt = (np.asarray(o) for o in model([px, emb]))
    with torch.no_grad():
        want = proto._torch_module(input_ids=torch.from_numpy(ids),
                                   pixel_values=torch.from_numpy(px))
    np.testing.assert_allclose(logits, want.logits_per_image.numpy(),
                               atol=1e-5)
    np.testing.assert_allclose(img, want.image_embeds.numpy(), atol=1e-6)
    np.testing.assert_allclose(txt, want.text_embeds.numpy(), atol=1e-6)
    # embeds are L2-normalized
    np.testing.assert_allclose(np.linalg.norm(img, axis=-1), 1.0,
                               rtol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(txt, axis=-1), 1.0,
                               rtol=1e-5)


def test_clip_attention_fuses(clip):
    """Both towers emit the matcher's idiom: the vision side fuses as
    head-split blocks, the causal text side fuses with the in-kernel
    additive mask -- all 4 attention blocks, zero failures."""
    proto, model = clip
    px, _, emb = _inputs(proto)
    q = model.quantize([px, emb], bit_width=8)
    base = [np.asarray(o) for o in q([px, emb])]
    rep = q.optimize()
    assert rep["fuse_attention"] == 4, rep
    assert rep["fusion_failures"] == []
    fused = [np.asarray(o) for o in q([px, emb])]
    for a, b in zip(base, fused):
        np.testing.assert_array_equal(a, b)


def test_clip_quantized_retrieval(clip):
    """int8 PTQ keeps the (tiny, random-weight) retrieval ranking close
    to float: top-1 text per image agrees for most images."""
    proto, model = clip
    px, _, emb = _inputs(proto)
    f_logits = np.asarray(model([px, emb])[0])
    q = model.quantize([px, emb], bit_width=8)
    q_logits = np.asarray(q([px, emb])[0])
    assert q_logits.shape == f_logits.shape
    agree = (q_logits.argmax(-1) == f_logits.argmax(-1)).mean()
    assert agree >= 0.5
    # and the quantized similarity is numerically close overall
    assert np.abs(q_logits - f_logits).mean() < 2.0
