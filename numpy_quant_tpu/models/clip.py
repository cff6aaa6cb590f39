"""CLIP-style dual-encoder (contrastive vision + text) graph generator.

A multi-modal domain beside the single-tower families: ViT-like vision
encoder (patch Conv + class token + pre-LN blocks), causal text
encoder, QuickGELU MLPs, projection heads, L2 normalization and the
temperature-scaled similarity matrix -- ALL inside one graph, so
`logits_per_image` is a single jitted forward over (pixel_values,
text embeds). Attention emission follows the HF eager op order
(scores*scale, +mask, softmax), which is exactly the fusion matcher's
idiom, so `optimize()` fuses both towers' attention into the VMEM
kernels.

Pooling contract: the text tower pools the LAST position (T-1); build
prompts padded so EOS sits there (the test oracle places EOS last,
making HF's first-EOS pooling pick the same position). Lowered from a
LIVE transformers CLIPModel; the module forward is the float oracle
(SURVEY.md §4 test strategy). The reference has no multi-modal
surface; parity-plus.
"""
from __future__ import annotations

import numpy as np

from ..onnx.builder import GraphBuilder
from .vit import _ViTEmitter, _np


def _linear(e: _ViTEmitter, x: str, linear, name: str) -> str:
    g = e.g
    w = g.init(f"{name}.weight_t", _np(linear.weight).T)
    y = g.node("MatMul", [x, w], out=f"{name}/MatMul_out")
    if linear.bias is None:
        return y
    b = g.init(f"{name}.bias", _np(linear.bias))
    return g.node("Add", [y, b], out=f"{name}/Add_out")


def _layer_norm(e: _ViTEmitter, x: str, ln, name: str) -> str:
    g = e.g
    w = g.init(f"{name}.weight", _np(ln.weight))
    b = g.init(f"{name}.bias", _np(ln.bias))
    return g.node("LayerNormalization", [x, w, b],
                  out=f"{name}/LN_out", epsilon=float(ln.eps))


def _quickgelu(e: _ViTEmitter, x: str, name: str) -> str:
    """QuickGELU: x * sigmoid(1.702 * x)."""
    g = e.g
    c = g.const(np.array(np.float32(1.702), dtype=np.float32), "qgelu_c")
    s = g.node("Mul", [x, c], out=f"{name}/scaled")
    sig = g.node("Sigmoid", [s], out=f"{name}/sigmoid")
    return g.node("Mul", [x, sig], out=f"{name}/qgelu")


def _clip_attention(e: _ViTEmitter, x: str, attn, seq_len: int,
                    name: str, mask: str | None = None) -> str:
    """CLIPAttention, HF eager order: separate biased q/k/v
    projections, head split, scores * scale (+ additive causal mask on
    the text tower), softmax, context, out_proj."""
    g = e.g
    n_heads = attn.num_heads
    head_dim = attn.head_dim

    q = _linear(e, x, attn.q_proj, f"{name}.q_proj")
    k = _linear(e, x, attn.k_proj, f"{name}.k_proj")
    v = _linear(e, x, attn.v_proj, f"{name}.v_proj")

    def split_heads(t: str, which: str) -> str:
        shape = g.const(np.array([0, seq_len, n_heads, head_dim],
                                 dtype=np.int64), "headshape")
        r = g.node("Reshape", [t, shape], out=f"{name}/{which}_Reshape")
        return g.node("Transpose", [r], out=f"{name}/{which}_Transpose",
                      perm=[0, 2, 1, 3])

    qh, kh, vh = (split_heads(t, w) for t, w in
                  ((q, "q"), (k, "k"), (v, "v")))
    kt = g.node("Transpose", [kh], out=f"{name}/k_T", perm=[0, 1, 3, 2])
    scores = g.node("MatMul", [qh, kt], out=f"{name}/scores")
    scal = g.const(np.array(np.float32(attn.scale), dtype=np.float32),
                   "scale")
    scaled = g.node("Mul", [scores, scal], out=f"{name}/scaled")
    if mask is not None:
        scaled = g.node("Add", [scaled, mask], out=f"{name}/masked")
    probs = g.node("Softmax", [scaled], out=f"{name}/probs", axis=-1)
    ctx = g.node("MatMul", [probs, vh], out=f"{name}/context")
    ctx = g.node("Transpose", [ctx], out=f"{name}/context_T",
                 perm=[0, 2, 1, 3])
    merge = g.const(np.array([0, seq_len, n_heads * head_dim],
                             dtype=np.int64), "mergeshape")
    merged = g.node("Reshape", [ctx, merge], out=f"{name}/merged")
    return _linear(e, merged, attn.out_proj, f"{name}.out_proj")


def _encoder_layer(e: _ViTEmitter, x: str, layer, seq_len: int,
                   name: str, mask: str | None = None) -> str:
    """CLIPEncoderLayer (pre-LN): x + attn(ln1(x)), then
    x + mlp(ln2(x)) with QuickGELU."""
    g = e.g
    ln1 = _layer_norm(e, x, layer.layer_norm1, f"{name}.layer_norm1")
    att = _clip_attention(e, ln1, layer.self_attn, seq_len,
                          f"{name}.self_attn", mask=mask)
    x1 = g.node("Add", [att, x], out=f"{name}/residual1")
    ln2 = _layer_norm(e, x1, layer.layer_norm2, f"{name}.layer_norm2")
    h = _linear(e, ln2, layer.mlp.fc1, f"{name}.mlp.fc1")
    h = _quickgelu(e, h, f"{name}.mlp")
    h = _linear(e, h, layer.mlp.fc2, f"{name}.mlp.fc2")
    return g.node("Add", [h, x1], out=f"{name}/residual2")


def _l2_normalize(e: _ViTEmitter, x: str, name: str) -> str:
    return e.g.node("LpNormalization", [x], out=f"{name}/normed",
                    axis=-1, p=2)


def default_config(seq_len: int = 8, image_size: int = 16,
                   patch_size: int = 8):
    from transformers import CLIPConfig

    return CLIPConfig(
        text_config=dict(vocab_size=96, hidden_size=32,
                         intermediate_size=48, num_hidden_layers=2,
                         num_attention_heads=4,
                         max_position_embeddings=seq_len,
                         bos_token_id=1, eos_token_id=95),
        vision_config=dict(hidden_size=32, intermediate_size=48,
                           num_hidden_layers=2, num_attention_heads=4,
                           image_size=image_size, patch_size=patch_size),
        projection_dim=24)


def clip_dual_encoder(config=None, batch_images: int = 2,
                      batch_texts: int = 3, seq_len: int = 8,
                      seed: int = 0, module=None):
    """CLIPModel over ``pixel_values`` [B_img, 3, S, S] and text
    ``inputs_embeds`` [B_txt, T, H_txt] (token+position embedding
    gathered by the caller from ``_wte``/``_wpe``; EOS must sit at
    position T-1 -- the graph pools there). Outputs, in order:
    ``logits_per_image`` [B_img, B_txt], ``image_embeds`` (L2-normed),
    ``text_embeds`` (L2-normed)."""
    import torch
    from transformers.models.clip.modeling_clip import CLIPModel

    if module is None:
        torch.manual_seed(seed)
        if config is None:
            config = default_config(seq_len)
        module = CLIPModel(config).eval()
    config = module.config
    vcfg, tcfg = config.vision_config, config.text_config
    grid = vcfg.image_size // vcfg.patch_size
    n_patch = grid * grid

    g = GraphBuilder("clip_dual_encoder")
    e = _ViTEmitter(g)

    # ---- vision tower -------------------------------------------------
    px = g.input("pixel_values",
                 [batch_images, 3, vcfg.image_size, vcfg.image_size])
    vemb = module.vision_model.embeddings
    pw = g.init("vision.patch_embed.weight", _np(vemb.patch_embedding.weight))
    patches = g.node("Conv", [px, pw], out="vision/patch_conv",
                     strides=[vcfg.patch_size, vcfg.patch_size],
                     kernel_shape=[vcfg.patch_size, vcfg.patch_size])
    flat = g.const(np.array([0, vcfg.hidden_size, n_patch],
                            dtype=np.int64), "vflat")
    pr = g.node("Reshape", [patches, flat], out="vision/patch_flat")
    pt = g.node("Transpose", [pr], out="vision/patch_tokens",
                perm=[0, 2, 1])
    cls = g.init("vision.class_embedding",
                 np.broadcast_to(_np(vemb.class_embedding),
                                 (batch_images, 1, vcfg.hidden_size))
                 .copy())
    tokens = g.node("Concat", [cls, pt], out="vision/tokens", axis=1)
    vpos = g.init("vision.pos_embed",
                  _np(vemb.position_embedding.weight)[None])
    h = g.node("Add", [tokens, vpos], out="vision/embedded")
    h = _layer_norm(e, h, module.vision_model.pre_layrnorm,
                    "vision.pre_ln")
    v_len = n_patch + 1
    for i, layer in enumerate(module.vision_model.encoder.layers):
        h = _encoder_layer(e, h, layer, v_len, f"vision.layers.{i}")
    # pooled = post_layernorm(CLS)
    z = g.const(np.array([0], dtype=np.int64), "zero")
    one = g.const(np.array([1], dtype=np.int64), "one")
    ax1 = g.const(np.array([1], dtype=np.int64), "axis1")
    cls_tok = g.node("Slice", [h, z, one, ax1], out="vision/cls_slice")
    vshape = g.const(np.array([0, vcfg.hidden_size], dtype=np.int64),
                     "vpool_shape")
    pooled_v = g.node("Reshape", [cls_tok, vshape], out="vision/pooled")
    pooled_v = _layer_norm(e, pooled_v, module.vision_model.post_layernorm,
                           "vision.post_ln")
    img_proj = _linear(e, pooled_v, module.visual_projection,
                       "visual_projection")
    img_emb = _l2_normalize(e, img_proj, "image_embeds_n")

    # ---- text tower (causal) -----------------------------------------
    tx = g.input("text_embeds_in", [batch_texts, seq_len, tcfg.hidden_size])
    # HF builds the causal mask with float32 min (exact parity)
    mval = np.finfo(np.float32).min
    cm = np.triu(np.full((seq_len, seq_len), mval, np.float32), k=1)
    cmask = g.init("text.causal_mask", cm[None, None])
    t = tx
    for i, layer in enumerate(module.text_model.encoder.layers):
        t = _encoder_layer(e, t, layer, seq_len, f"text.layers.{i}",
                           mask=cmask)
    t = _layer_norm(e, t, module.text_model.final_layer_norm,
                    "text.final_ln")
    # pool position T-1 (EOS by contract)
    last = g.const(np.array([seq_len - 1], dtype=np.int64), "tlast")
    tend = g.const(np.array([seq_len], dtype=np.int64), "tend")
    eos_tok = g.node("Slice", [t, last, tend, ax1], out="text/eos_slice")
    tshape = g.const(np.array([0, tcfg.hidden_size], dtype=np.int64),
                     "tpool_shape")
    pooled_t = g.node("Reshape", [eos_tok, tshape], out="text/pooled")
    txt_proj = _linear(e, pooled_t, module.text_projection,
                       "text_projection")
    txt_emb = _l2_normalize(e, txt_proj, "text_embeds_n")

    # ---- similarity ----------------------------------------------------
    # logits_per_image = exp(logit_scale) * img @ text^T
    ls = g.const(np.array(np.float32(
        np.exp(_np(module.logit_scale))), dtype=np.float32), "logit_scale")
    txt_t = g.node("Transpose", [txt_emb], out="text/emb_T", perm=[1, 0])
    sim = g.node("MatMul", [img_emb, txt_t], out="sim")
    g.node("Mul", [sim, ls], out="logits_per_image", name="logit_mul")

    g.output("logits_per_image", [batch_images, batch_texts])
    g.node("Identity", [img_emb], out="image_embeds", name="img_id")
    g.node("Identity", [txt_emb], out="text_embeds", name="txt_id")
    g.output("image_embeds", [batch_images, config.projection_dim])
    g.output("text_embeds", [batch_texts, config.projection_dim])

    model = g.model()
    model._torch_module = module
    model._wte = _np(module.text_model.embeddings.token_embedding.weight)
    model._wpe = _np(module.text_model.embeddings.position_embedding.weight)
    return model
