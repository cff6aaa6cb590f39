"""Access to the reference implementation as a numerical oracle.

The reference (tebartsch/numpy-quant) is mounted read-only at
/root/reference. Its tensor/quant-math modules import only numpy, so we
import them directly and compare bit-for-bit. Its graph layer imports
the ``onnx`` package (absent here); tests that need it install our own
ONNX implementation as an API-compatible shim first (see onnx_shim()).

Tests using the oracle must skip when the reference isn't present so the
suite still passes in a standalone checkout.
"""
from __future__ import annotations

import sys

import pytest

REFERENCE_PATH = "/root/reference"


def _ensure_path():
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)


def reference_available() -> bool:
    import os
    return os.path.isdir(REFERENCE_PATH)


requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted")


def ref_quantization():
    """numpy_quant.numpy_quantization from the reference (numpy-only)."""
    _ensure_path()
    import numpy_quant.numpy_quantization as m
    return m


def ref_tensor():
    """numpy_quant.tensor from the reference (numpy-only)."""
    _ensure_path()
    import numpy_quant.tensor as m
    return m


def ref_numpy_helper():
    _ensure_path()
    import numpy_quant.numpy_helper as m
    return m


def onnx_shim():
    """Install our ONNX implementation as an ``onnx`` module shim so the
    reference's graph layer (numpy_quant/model.py) becomes importable.

    Returns the reference's model module.
    """
    _ensure_path()
    import types

    import numpy_quant_tpu.onnx as our_onnx

    if "onnx" not in sys.modules or not hasattr(sys.modules["onnx"], "_nq_tpu_shim"):
        import importlib.machinery
        shim = types.ModuleType("onnx")
        shim._nq_tpu_shim = True
        shim.__spec__ = importlib.machinery.ModuleSpec("onnx", None)
        shim.__version__ = "1.17.0-nq-tpu-shim"
        for name in ("ModelProto", "GraphProto", "NodeProto", "TensorProto",
                     "AttributeProto", "ValueInfoProto", "load",
                     "load_from_string", "save"):
            setattr(shim, name, getattr(our_onnx, name))
        shim.save_model = our_onnx.save

        helper_mod = types.ModuleType("onnx.helper")
        helper_mod.get_attribute_value = our_onnx.get_attribute_value
        helper_mod.make_node = our_onnx.make_node
        helper_mod.make_graph = our_onnx.make_graph
        helper_mod.make_model = our_onnx.make_model
        helper_mod.make_tensor_value_info = our_onnx.make_tensor_value_info
        helper_mod.ValueInfoProto = our_onnx.ValueInfoProto

        numpy_helper_mod = types.ModuleType("onnx.numpy_helper")
        numpy_helper_mod.to_array = our_onnx.to_array
        numpy_helper_mod.from_array = our_onnx.from_array

        mapping_mod = types.ModuleType("onnx.mapping")

        shim.helper = helper_mod
        shim.numpy_helper = numpy_helper_mod
        shim.mapping = mapping_mod
        sys.modules["onnx"] = shim
        sys.modules["onnx.helper"] = helper_mod
        sys.modules["onnx.numpy_helper"] = numpy_helper_mod
        sys.modules["onnx.mapping"] = mapping_mod

    import numpy_quant.model as ref_model
    return ref_model
