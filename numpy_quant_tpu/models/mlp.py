"""MLP model: torch training on sklearn make_circles + ONNX export.

Mirrors the reference model (reference: models/mlp.py:12-91): a 2->5->2
MLP (Gemm/Relu/Gemm/Sigmoid) trained on make_circles and exported with a
dynamic batch axis. The export is done with our own ONNX builder
(the environment has no ``onnx`` package for torch.onnx.export), using
the same graph/value names the torch exporter would produce.
"""
from __future__ import annotations

import pathlib

import numpy as np

from .. import onnx as O

base_path = pathlib.Path(__file__).parent


def build_mlp_onnx(fc1_weight: np.ndarray, fc1_bias: np.ndarray,
                   fc2_weight: np.ndarray, fc2_bias: np.ndarray,
                   dynamic_batch: bool = True) -> O.ModelProto:
    """Gemm(transB)->Relu->Gemm(transB)->Sigmoid graph with torch-exporter
    naming (reference: test/test_mlp.py:85-101 asserts these names)."""
    batch = "batch_size" if dynamic_batch else 1
    inp = O.make_tensor_value_info("input", O.TensorProto.FLOAT,
                                   [batch, fc1_weight.shape[1]])
    out = O.make_tensor_value_info("output", O.TensorProto.FLOAT,
                                   [batch, fc2_weight.shape[0]])
    inits = [
        O.from_array(fc1_weight.astype(np.float32), "fc1.weight"),
        O.from_array(fc1_bias.astype(np.float32), "fc1.bias"),
        O.from_array(fc2_weight.astype(np.float32), "fc2.weight"),
        O.from_array(fc2_bias.astype(np.float32), "fc2.bias"),
    ]
    nodes = [
        O.make_node("Gemm", ["input", "fc1.weight", "fc1.bias"],
                    ["/fc1/Gemm_output_0"], name="/fc1/Gemm",
                    alpha=1.0, beta=1.0, transB=1),
        O.make_node("Relu", ["/fc1/Gemm_output_0"], ["/relu/Relu_output_0"],
                    name="/relu/Relu"),
        O.make_node("Gemm", ["/relu/Relu_output_0", "fc2.weight", "fc2.bias"],
                    ["/fc2/Gemm_output_0"], name="/fc2/Gemm",
                    alpha=1.0, beta=1.0, transB=1),
        O.make_node("Sigmoid", ["/fc2/Gemm_output_0"], ["output"],
                    name="/sigmoid/Sigmoid"),
    ]
    graph = O.make_graph(nodes, "main_graph", [inp], [out], initializer=inits)
    return O.make_model(graph, producer_name="numpy-quant-tpu",
                        opset_imports=[O.make_opsetid("", 17)])


def get_torch_model(hidden_size: int = 5, n_samples: int = 1000,
                    epochs: int = 1500, seed: int = 1):
    """Train the 2->hidden->2 MLP on make_circles (torch, CPU).
    reference: models/mlp.py:12-74."""
    import torch
    from sklearn.datasets import make_circles

    torch.manual_seed(seed)
    X, Y = make_circles(n_samples=n_samples, noise=0.03, random_state=seed)
    X = torch.tensor(X, dtype=torch.float32)
    Y1h = torch.nn.functional.one_hot(torch.tensor(Y), 2).float()

    model = torch.nn.Sequential(
        torch.nn.Linear(2, hidden_size),
        torch.nn.ReLU(),
        torch.nn.Linear(hidden_size, 2),
        torch.nn.Sigmoid(),
    )
    opt = torch.optim.Adam(model.parameters(), lr=0.02)
    loss_fn = torch.nn.BCELoss()
    for _ in range(epochs):
        opt.zero_grad()
        loss = loss_fn(model(X), Y1h)
        loss.backward()
        opt.step()
    acc = (model(X).argmax(dim=1) == torch.tensor(Y)).float().mean().item()
    return model, acc


def export_mlp(path=None, seed: int = 1) -> O.ModelProto:
    model, acc = get_torch_model(seed=seed)
    fc1, fc2 = model[0], model[2]
    onnx_model = build_mlp_onnx(
        fc1.weight.detach().numpy(), fc1.bias.detach().numpy(),
        fc2.weight.detach().numpy(), fc2.bias.detach().numpy())
    if path is not None:
        O.save(onnx_model, path)
    return onnx_model


if __name__ == "__main__":
    model = export_mlp(base_path / "mlp.onnx")
    print(f"saved {base_path / 'mlp.onnx'}")
