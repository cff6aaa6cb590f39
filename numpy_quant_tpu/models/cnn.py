"""Small CNN classifier generator (BASELINE.md config: "Conv2d CNN graph
int8: conv + bias + relu requantize chain").

Conv/Relu/MaxPool x2 -> GlobalAveragePool -> Flatten -> Gemm. With
``quantize_conv=True`` the convolutions run on the int8 MXU path
(im2col + q_matmul + requantize); otherwise conv stays float like the
reference's quantized executor (SURVEY.md §3.4).
"""
from __future__ import annotations

import numpy as np

from .. import onnx as O
from ..onnx.builder import GraphBuilder


def cnn_classifier(batch: int, image_size: int = 32, channels: int = 3,
                   widths=(16, 32), n_classes: int = 10,
                   seed: int = 0) -> O.ModelProto:
    rng = np.random.default_rng(seed)
    g = GraphBuilder("cnn_classifier")
    x = g.input("input", [batch, channels, image_size, image_size])

    c_in = channels
    h = x
    size = image_size
    for i, c_out in enumerate(widths):
        w = g.init(f"conv{i}.weight",
                   (rng.standard_normal((c_out, c_in, 3, 3)) /
                    np.sqrt(9 * c_in)).astype(np.float32))
        b = g.init(f"conv{i}.bias",
                   (rng.standard_normal(c_out) * 0.1).astype(np.float32))
        h = g.node("Conv", [h, w, b], out=f"/conv{i}_out",
                   kernel_shape=[3, 3], pads=[1, 1, 1, 1], strides=[1, 1])
        h = g.node("Relu", [h], out=f"/relu{i}_out")
        h = g.node("MaxPool", [h], out=f"/pool{i}_out",
                   kernel_shape=[2, 2], strides=[2, 2])
        size //= 2
        c_in = c_out

    h = g.node("GlobalAveragePool", [h], out="/gap_out")
    h = g.node("Flatten", [h], out="/flat_out", axis=1)
    wf = g.init("fc.weight",
                (rng.standard_normal((n_classes, c_in)) /
                 np.sqrt(c_in)).astype(np.float32))
    bf = g.init("fc.bias",
                (rng.standard_normal(n_classes) * 0.1).astype(np.float32))
    g.node("Gemm", [h, wf, bf], out="logits", alpha=1.0, beta=1.0, transB=1)
    g.output("logits", [batch, n_classes])
    model = g.model()

    def torch_forward(x_np):
        import torch
        t = torch.tensor(x_np)
        inits = {i.name: torch.tensor(O.to_array(i))
                 for i in model.graph.initializer}
        for i in range(len(widths)):
            t = torch.nn.functional.conv2d(t, inits[f"conv{i}.weight"],
                                           inits[f"conv{i}.bias"], padding=1)
            t = torch.relu(t)
            t = torch.nn.functional.max_pool2d(t, 2)
        t = t.mean(dim=(2, 3))
        t = t @ inits["fc.weight"].T + inits["fc.bias"]
        return t.numpy()

    model._torch_forward = torch_forward
    return model
