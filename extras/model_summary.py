"""ASCII model summary (reference: extra/model_summary.py)."""
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from numpy_quant_tpu.utils.summary import summarize  # noqa: E402,F401

if __name__ == "__main__":
    import numpy_quant_tpu as nq
    path = sys.argv[1] if len(sys.argv) > 1 else \
        "numpy_quant_tpu/models/mlp.onnx"
    print(summarize(nq.Model.from_onnx(nq.onnx.load(path))))
