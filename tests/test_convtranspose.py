"""ConvTranspose + GroupNormalization vs torch oracles."""
import numpy as np
import pytest

import numpy_quant_tpu as nq
from numpy_quant_tpu import onnx as O

RNG = np.random.default_rng(17)


def _model(nodes, feeds, inits=(), outs=()):
    in_infos = [O.make_tensor_value_info(n, O.TensorProto.FLOAT,
                                         list(a.shape))
                for n, a in feeds.items()]
    out_infos = [O.make_tensor_value_info(n, O.TensorProto.FLOAT, None)
                 for n in outs]
    g = O.make_graph(list(nodes), "g", in_infos, out_infos,
                     initializer=list(inits))
    return nq.Model.from_onnx(O.make_model(g))


@pytest.mark.parametrize("stride,pad,opad,dil,group", [
    (1, 0, 0, 1, 1),
    (2, 1, 1, 1, 1),
    (2, 0, 0, 1, 2),
    (1, 2, 0, 2, 1),
])
def test_convtranspose_vs_torch(stride, pad, opad, dil, group):
    torch = pytest.importorskip("torch")
    ci, co, k = 4, 6, 3
    x = RNG.standard_normal((2, ci, 7, 7)).astype(np.float32)
    w = (RNG.standard_normal((ci, co // group, k, k)) / k).astype(np.float32)
    b = RNG.standard_normal(co).astype(np.float32)
    node = O.make_node("ConvTranspose", ["x", "w", "b"], ["y"],
                       strides=[stride, stride], pads=[pad] * 4,
                       output_padding=[opad, opad],
                       dilations=[dil, dil], group=group,
                       kernel_shape=[k, k])
    model = _model([node], {"x": x},
                   inits=[O.from_array(w, "w"), O.from_array(b, "b")],
                   outs=["y"])
    actual = model([x])[0]
    want = torch.nn.functional.conv_transpose2d(
        torch.tensor(x), torch.tensor(w), torch.tensor(b),
        stride=stride, padding=pad, output_padding=opad,
        dilation=dil, groups=group).numpy()
    np.testing.assert_allclose(np.asarray(actual), want, atol=1e-4)


def test_convtranspose_1d_vs_torch():
    torch = pytest.importorskip("torch")
    x = RNG.standard_normal((2, 3, 11)).astype(np.float32)
    w = (RNG.standard_normal((3, 5, 4)) / 2).astype(np.float32)
    node = O.make_node("ConvTranspose", ["x", "w"], ["y"],
                       strides=[2], pads=[1, 1], kernel_shape=[4])
    model = _model([node], {"x": x}, inits=[O.from_array(w, "w")],
                   outs=["y"])
    actual = model([x])[0]
    want = torch.nn.functional.conv_transpose1d(
        torch.tensor(x), torch.tensor(w), stride=2, padding=1).numpy()
    np.testing.assert_allclose(np.asarray(actual), want, atol=1e-4)


@pytest.mark.parametrize("groups,per_group", [(2, False), (4, False),
                                              (2, True)])
def test_groupnorm_vs_torch(groups, per_group):
    torch = pytest.importorskip("torch")
    c = 8
    x = RNG.standard_normal((3, c, 5, 5)).astype(np.float32)
    n_aff = groups if per_group else c
    gamma = RNG.uniform(0.5, 1.5, n_aff).astype(np.float32)
    beta = RNG.standard_normal(n_aff).astype(np.float32)
    node = O.make_node("GroupNormalization",
                       ["x", "gamma", "beta"], ["y"],
                       num_groups=groups, epsilon=1e-4)
    model = _model([node], {"x": x},
                   inits=[O.from_array(gamma, "gamma"),
                          O.from_array(beta, "beta")], outs=["y"])
    actual = model([x])[0]
    tg = np.repeat(gamma, c // groups) if per_group else gamma
    tb = np.repeat(beta, c // groups) if per_group else beta
    want = torch.nn.functional.group_norm(
        torch.tensor(x), groups, torch.tensor(tg), torch.tensor(tb),
        eps=1e-4).numpy()
    np.testing.assert_allclose(np.asarray(actual), want, atol=1e-5)


def test_unet_decoder_with_convtranspose_quantized():
    """Encoder conv -> ConvTranspose upsample decoder -> head, through
    calibrate/quantize (ConvTranspose runs float like every non-matmul
    op in the reference executor, SURVEY.md §3.4)."""
    ci, w0 = 3, 8
    x = RNG.standard_normal((4, ci, 16, 16)).astype(np.float32)
    enc_w = (RNG.standard_normal((w0, ci, 3, 3)) / 3).astype(np.float32)
    up_w = (RNG.standard_normal((w0, w0, 2, 2)) / 2).astype(np.float32)
    head_w = (RNG.standard_normal((2, w0, 1, 1))).astype(np.float32)
    nodes = [
        O.make_node("Conv", ["x", "enc_w"], ["e"], kernel_shape=[3, 3],
                    pads=[1, 1, 1, 1], strides=[2, 2]),
        O.make_node("Relu", ["e"], ["er"]),
        O.make_node("ConvTranspose", ["er", "up_w"], ["u"],
                    strides=[2, 2], kernel_shape=[2, 2]),
        O.make_node("Relu", ["u"], ["ur"]),
        O.make_node("Conv", ["ur", "head_w"], ["y"], kernel_shape=[1, 1]),
    ]
    model = _model(nodes, {"x": x},
                   inits=[O.from_array(a, n) for a, n in
                          ((enc_w, "enc_w"), (up_w, "up_w"),
                           (head_w, "head_w"))], outs=["y"])
    f = model([x])[0]
    assert np.asarray(f).shape == (4, 2, 16, 16)
    q = model.quantize([x], bit_width=8)
    out = q([x])[0]
    denom = np.asarray(f).max() - np.asarray(f).min()
    assert np.mean(np.abs(np.asarray(out) - np.asarray(f))) / denom < 0.05
