"""ViT ONNX graph generators.

Equivalent of the reference's torch-export-based generators
(reference: models/test.py:184-305, models/vit.py:15-87). The
environment has no ``onnx`` package, so ``torch.onnx.export`` is
unavailable; instead we lower HuggingFace ViT modules to ONNX with our
own builder, emitting the same node patterns the torch exporter
produces for these models:

* Linear on 3D activations -> MatMul(pre-transposed weight) + Add(bias)
* Linear on 2D activations -> Gemm(transB=1)
* exact GELU               -> Div/Erf/Add/Mul/Mul chain
* LayerNorm                -> opset-17 LayerNormalization
* attention head split     -> Shape/Gather/Unsqueeze/Concat -> Reshape
                              -> Transpose chains (dynamic batch dim)
* cls-token broadcast      -> Equal/Where/Expand on the shape domain

Weights come from a live transformers module, so every generated graph
is verified against the module's own torch forward in tests.
"""
from __future__ import annotations

import numpy as np

from ..onnx.builder import GraphBuilder
from .. import onnx as O


def _np(t) -> np.ndarray:
    return t.detach().cpu().numpy().astype(np.float32)


class _ViTEmitter:
    """Shared node-emission helpers over a GraphBuilder."""

    def __init__(self, g: GraphBuilder, prefix: str = ""):
        self.g = g
        self.prefix = prefix

    def linear3d(self, x: str, linear, name: str) -> str:
        """torch Linear on a 3D tensor: MatMul + Add (exporter pattern)."""
        g = self.g
        w = g.init(f"{name}.weight_t", _np(linear.weight).T)
        y = g.node("MatMul", [x, w], out=f"{name}/MatMul_out")
        b = g.init(f"{name}.bias", _np(linear.bias))
        return g.node("Add", [y, b], out=f"{name}/Add_out")

    def linear2d(self, x: str, linear, name: str) -> str:
        """torch Linear on a 2D tensor: Gemm(transB=1)."""
        g = self.g
        w = g.init(f"{name}.weight", _np(linear.weight))
        b = g.init(f"{name}.bias", _np(linear.bias))
        return g.node("Gemm", [x, w, b], out=f"{name}/Gemm_out",
                      alpha=1.0, beta=1.0, transB=1)

    def layernorm(self, x: str, ln, name: str) -> str:
        g = self.g
        scale = g.init(f"{name}.weight", _np(ln.weight))
        bias = g.init(f"{name}.bias", _np(ln.bias))
        return g.node("LayerNormalization", [x, scale, bias],
                      out=f"{name}/LayerNorm_out", axis=-1,
                      epsilon=float(ln.eps))

    def gelu(self, x: str, name: str) -> str:
        """Exact erf GELU, as the torch exporter decomposes it."""
        g = self.g
        sqrt2 = g.const(np.array(np.sqrt(2.0), dtype=np.float32), "sqrt2")
        d = g.node("Div", [x, sqrt2], out=f"{name}/Div_out")
        e = g.node("Erf", [d], out=f"{name}/Erf_out")
        one = g.const(np.array(1.0, dtype=np.float32), "one")
        a = g.node("Add", [e, one], out=f"{name}/AddOne_out")
        m = g.node("Mul", [x, a], out=f"{name}/Mul_out")
        half = g.const(np.array(0.5, dtype=np.float32), "half")
        return g.node("Mul", [m, half], out=f"{name}/MulHalf_out")

    def batch_dim(self, x: str, name: str) -> str:
        """Shape(x) -> Gather(0) -> Unsqueeze: the dynamic batch dim as a
        1-element int64 tensor."""
        g = self.g
        s = g.node("Shape", [x], out=f"{name}/Shape_out")
        i0 = g.const(np.array(0, dtype=np.int64), "idx0")
        d = g.node("Gather", [s, i0], out=f"{name}/Gather_out", axis=0)
        ax = g.const(np.array([0], dtype=np.int64), "axes0")
        return g.node("Unsqueeze", [d, ax], out=f"{name}/Unsqueeze_out")

    def self_attention(self, x: str, attention, name: str) -> str:
        """HF ViTSelfAttention: q/k/v heads, scores*scaling, softmax,
        context; returns (B, N, H) context."""
        g = self.g
        num_heads = attention.num_attention_heads
        head_size = attention.attention_head_size
        scaling = np.float32(1.0 / np.sqrt(head_size))

        q = self.linear3d(x, attention.query, f"{name}.query")
        k = self.linear3d(x, attention.key, f"{name}.key")
        v = self.linear3d(x, attention.value, f"{name}.value")

        b_dim = self.batch_dim(x, f"{name}/bdim")
        tail = g.const(np.array([-1, num_heads, head_size], dtype=np.int64),
                       "headshape")
        new_shape = g.node("Concat", [b_dim, tail],
                           out=f"{name}/Concat_shape", axis=0)

        def split_heads(t: str, which: str) -> str:
            r = g.node("Reshape", [t, new_shape], out=f"{name}/{which}_Reshape")
            return g.node("Transpose", [r], out=f"{name}/{which}_Transpose",
                          perm=[0, 2, 1, 3])

        qh = split_heads(q, "q")
        kh = split_heads(k, "k")
        vh = split_heads(v, "v")

        kt = g.node("Transpose", [kh], out=f"{name}/k_T", perm=[0, 1, 3, 2])
        scores = g.node("MatMul", [qh, kt], out=f"{name}/scores")
        scal = g.const(np.array(scaling, dtype=np.float32), "scaling")
        scaled = g.node("Mul", [scores, scal], out=f"{name}/scaled")
        probs = g.node("Softmax", [scaled], out=f"{name}/probs", axis=-1)
        ctx = g.node("MatMul", [probs, vh], out=f"{name}/context")
        ctx = g.node("Transpose", [ctx], out=f"{name}/context_T",
                     perm=[0, 2, 1, 3])
        merge_tail = g.const(np.array([-1, num_heads * head_size],
                                      dtype=np.int64), "mergeshape")
        merge_shape = g.node("Concat", [b_dim, merge_tail],
                             out=f"{name}/Concat_merge", axis=0)
        return g.node("Reshape", [ctx, merge_shape], out=f"{name}/merged")

    def encoder_layer(self, x: str, layer, name: str) -> str:
        """HF ViTLayer: pre-LN attention + residual, pre-LN MLP + residual."""
        ln1 = self.layernorm(x, layer.layernorm_before, f"{name}.ln_before")
        ctx = self.self_attention(ln1, layer.attention.attention,
                                  f"{name}.attention")
        att_out = self.linear3d(ctx, layer.attention.output.dense,
                                f"{name}.attention.output")
        x1 = self.g.node("Add", [att_out, x], out=f"{name}/residual1")
        ln2 = self.layernorm(x1, layer.layernorm_after, f"{name}.ln_after")
        inter = self.linear3d(ln2, layer.intermediate.dense,
                              f"{name}.intermediate")
        act = self.gelu(inter, f"{name}.gelu")
        mlp_out = self.linear3d(act, layer.output.dense, f"{name}.output")
        return self.g.node("Add", [mlp_out, x1], out=f"{name}/residual2")

    def embeddings(self, x: str, embeddings, name: str) -> str:
        """HF ViTEmbeddings: patch conv, flatten, cls concat, pos add."""
        g = self.g
        proj = embeddings.patch_embeddings.projection
        hidden = proj.out_channels
        patch = proj.kernel_size[0]
        w = g.init(f"{name}.projection.weight", _np(proj.weight))
        b = g.init(f"{name}.projection.bias", _np(proj.bias))
        conv = g.node("Conv", [x, w, b], out=f"{name}/Conv_out",
                      kernel_shape=[patch, patch], pads=[0, 0, 0, 0],
                      strides=[patch, patch])
        # flatten(2) + transpose(1, 2)
        b_dim = self.batch_dim(x, f"{name}/bdim")
        tail = g.const(np.array([hidden, -1], dtype=np.int64), "flatshape")
        flat_shape = g.node("Concat", [b_dim, tail],
                            out=f"{name}/Concat_flat", axis=0)
        flat = g.node("Reshape", [conv, flat_shape], out=f"{name}/flat")
        patches = g.node("Transpose", [flat], out=f"{name}/patches",
                         perm=[0, 2, 1])

        # cls token: expand (B, 1, H) via the torch Expand lowering
        # (Equal/Where on the shape domain)
        cls = g.init(f"{name}.cls_token", _np(embeddings.cls_token))
        minus1 = g.const(np.array([-1, -1], dtype=np.int64), "minus1")
        target = g.node("Concat", [b_dim, minus1],
                        out=f"{name}/Concat_target", axis=0)
        m1 = g.const(np.array([-1], dtype=np.int64), "m1")
        mask = g.node("Equal", [target, m1], out=f"{name}/Equal_out")
        cls_shape = g.node("Shape", [cls], out=f"{name}/cls_shape")
        resolved = g.node("Where", [mask, cls_shape, target],
                          out=f"{name}/Where_out")
        cls_exp = g.node("Expand", [cls, resolved], out=f"{name}/cls_expand")

        tokens = g.node("Concat", [cls_exp, patches],
                        out=f"{name}/tokens", axis=1)
        pos = g.init(f"{name}.position_embeddings",
                     _np(embeddings.position_embeddings))
        return g.node("Add", [tokens, pos], out=f"{name}/embeddings")

    def pooler(self, x: str, pooler, name: str) -> str:
        """HF ViTPooler: dense+tanh on the CLS token."""
        g = self.g
        # x[:, 0] -> Gather(axis=1, scalar 0)
        i0 = g.const(np.array(0, dtype=np.int64), "idx0")
        cls = g.node("Gather", [x, i0], out=f"{name}/cls", axis=1)
        dense = self.linear2d(cls, pooler.dense, f"{name}.dense")
        return g.node("Tanh", [dense], out=f"{name}/Tanh_out")


# ---------------------------------------------------------------------------
# Public generators (same parameterization as reference models/test.py)
# ---------------------------------------------------------------------------

def vit_self_attention(batch_size: int, embeddings_size: int, hidden_size: int,
                       num_attention_heads: int, seed: int = 0) -> O.ModelProto:
    """reference: models/test.py:207-227"""
    import torch
    from transformers import ViTConfig
    from transformers.models.vit.modeling_vit import ViTSelfAttention

    torch.manual_seed(seed)
    cfg = ViTConfig(hidden_size=hidden_size,
                    num_attention_heads=num_attention_heads,
                    attn_implementation="eager")
    module = ViTSelfAttention(cfg).eval()

    g = GraphBuilder("vit_self_attention")
    e = _ViTEmitter(g)
    x = g.input("input_states", [batch_size, embeddings_size, hidden_size])
    ctx = e.self_attention(x, module, "attn")
    g.node("Identity", [ctx], out="output_states", name="out_identity")
    g.output("output_states", [batch_size, embeddings_size, hidden_size])
    model = g.model()
    model._torch_module = module  # test oracle handle
    return model


def vit_embedding(batch_size: int, image_size: int, patch_size: int,
                  hidden_size: int, seed: int = 0) -> O.ModelProto:
    """reference: models/test.py:184-204"""
    import torch
    from transformers import ViTConfig
    from transformers.models.vit.modeling_vit import ViTEmbeddings

    torch.manual_seed(seed)
    cfg = ViTConfig(image_size=image_size, patch_size=patch_size,
                    hidden_size=hidden_size)
    module = ViTEmbeddings(cfg).eval()

    g = GraphBuilder("vit_embedding")
    e = _ViTEmitter(g)
    x = g.input("inputs", [batch_size, 3, image_size, image_size])
    emb = e.embeddings(x, module, "embeddings")
    g.node("Identity", [emb], out="hidden_states", name="out_identity")
    n_tokens = (image_size // patch_size) ** 2 + 1
    g.output("hidden_states", [batch_size, n_tokens, hidden_size])
    model = g.model()
    model._torch_module = module
    return model


def vit_layer(batch_size: int, image_size: int, patch_size: int,
              intermediate_size: int, hidden_size: int,
              num_attention_heads: int, seed: int = 0) -> O.ModelProto:
    """reference: models/test.py:230-254"""
    import torch
    from transformers import ViTConfig
    from transformers.models.vit.modeling_vit import ViTLayer

    torch.manual_seed(seed)
    cfg = ViTConfig(image_size=image_size, patch_size=patch_size,
                    hidden_size=hidden_size,
                    num_attention_heads=num_attention_heads,
                    intermediate_size=intermediate_size,
                    attn_implementation="eager")
    module = ViTLayer(cfg).eval()

    g = GraphBuilder("vit_layer")
    e = _ViTEmitter(g)
    n_tokens = (image_size // patch_size) ** 2 + 1
    x = g.input("inputs", [batch_size, n_tokens, hidden_size])
    y = e.encoder_layer(x, module, "layer")
    g.node("Identity", [y], out="hidden_states", name="out_identity")
    g.output("hidden_states", [batch_size, n_tokens, hidden_size])
    model = g.model()
    model._torch_module = module
    return model


def vit_pooler(batch_size: int, image_size: int, patch_size: int,
               hidden_size: int, seed: int = 0) -> O.ModelProto:
    """reference: models/test.py:257-279"""
    import torch
    from transformers import ViTConfig
    from transformers.models.vit.modeling_vit import ViTPooler

    torch.manual_seed(seed)
    cfg = ViTConfig(image_size=image_size, patch_size=patch_size,
                    hidden_size=hidden_size)
    module = ViTPooler(cfg).eval()

    g = GraphBuilder("vit_pooler")
    e = _ViTEmitter(g)
    n_tokens = (image_size // patch_size) ** 2 + 1
    x = g.input("inputs", [batch_size, n_tokens, hidden_size])
    y = e.pooler(x, module, "pooler")
    g.node("Identity", [y], out="pooler_output", name="out_identity")
    g.output("pooler_output", [batch_size, hidden_size])
    model = g.model()
    model._torch_module = module
    return model


def _emit_vit_model(g: GraphBuilder, e: _ViTEmitter, module, x: str) -> str:
    """Emit a full ViTModel (embeddings + encoder + final layernorm);
    returns the last_hidden_state value name."""
    h = e.embeddings(x, module.embeddings, "embeddings")
    for i, layer in enumerate(module.encoder.layer):
        h = e.encoder_layer(h, layer, f"encoder.layer.{i}")
    return e.layernorm(h, module.layernorm, "layernorm")


def vit(batch_size: int, image_size: int, patch_size: int,
        intermediate_size: int, hidden_size: int, num_attention_heads: int,
        num_hidden_layers: int = 2, seed: int = 0) -> O.ModelProto:
    """Full ViTModel. reference: models/test.py:282-305 (reference uses
    the default 12 layers; tests here use a small count for speed)."""
    import torch
    from transformers import ViTConfig
    from transformers.models.vit.modeling_vit import ViTModel

    torch.manual_seed(seed)
    cfg = ViTConfig(image_size=image_size, patch_size=patch_size,
                    hidden_size=hidden_size,
                    num_attention_heads=num_attention_heads,
                    intermediate_size=intermediate_size,
                    num_hidden_layers=num_hidden_layers,
                    attn_implementation="eager")
    module = ViTModel(cfg, add_pooling_layer=False).eval()

    g = GraphBuilder("vit")
    e = _ViTEmitter(g)
    x = g.input("inputs", [batch_size, 3, image_size, image_size])
    h = _emit_vit_model(g, e, module, x)
    g.node("Identity", [h], out="hidden_states", name="out_identity")
    n_tokens = (image_size // patch_size) ** 2 + 1
    g.output("hidden_states", [batch_size, n_tokens, hidden_size])
    model = g.model()
    model._torch_module = module
    return model


def vit_image_classifier(config=None, batch_size=None, seed: int = 0,
                         pretrained: str | None = None,
                         module=None) -> O.ModelProto:
    """Full ViTForImageClassification graph (ViT-Base-patch16-224 shaped
    by default). reference: models/vit.py:40-66. ``batch_size=None``
    exports a dynamic batch axis 'B' like the reference.
    ``module``: an existing (e.g. trained) ViTForImageClassification to
    export instead of a fresh random-init one."""
    import torch
    from transformers import ViTConfig
    from transformers.models.vit.modeling_vit import ViTForImageClassification

    torch.manual_seed(seed)
    if module is not None:
        module = module.eval()
        config = module.config
    elif pretrained is not None:
        module = ViTForImageClassification.from_pretrained(pretrained).eval()
        config = module.config
    else:
        if config is None:
            config = ViTConfig(num_labels=1000)  # ViT-Base-patch16-224 shape
        config.attn_implementation = "eager"
        module = ViTForImageClassification(config).eval()

    g = GraphBuilder("vit_image_classifier")
    e = _ViTEmitter(g)
    b = "B" if batch_size is None else batch_size
    x = g.input("inputs", [b, 3, config.image_size, config.image_size])
    h = _emit_vit_model(g, e, module.vit, x)
    # classifier on the CLS token: Gather(axis=1, 0) -> Gemm
    i0 = g.const(np.array(0, dtype=np.int64), "idx0")
    cls = g.node("Gather", [h, i0], out="/cls_token_out", axis=1)
    logits = e.linear2d(cls, module.classifier, "classifier")
    g.node("Identity", [logits], out="logits", name="out_identity")
    g.output("logits", [b, config.num_labels])
    model = g.model()
    model._torch_module = module
    return model
