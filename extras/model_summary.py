#!/usr/bin/env python
"""Model inspection CLI (reference: extra/model_summary.py).

Prints the reference-format ASCII Node/Inputs/Outputs table for any
ONNX file this framework can import, and optionally:

* ``--census``      per-op-type node counts (the quick "where are the
                    FLOPs" view -- e.g. ViT-Base is 96 MatMul + 6 Conv)
* ``--params``      initializer tensor/parameter totals and byte sizes
* ``--quantize B``  run a random-data calibration at bit width B and
                    summarize the QUANTIZED graph instead (shows the
                    inserted quantize/dequantize structure)
* ``--fix DIM=N``   pin a dynamic dimension before import

Usage::

    python extras/model_summary.py model.onnx --census --params
    python extras/model_summary.py model.onnx --quantize 8
"""
import argparse
import collections
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from numpy_quant_tpu.utils.summary import summarize  # noqa: E402


def op_census(model) -> str:
    counts = collections.Counter(n.op for n in model.nodes)
    width = max((len(op) for op in counts), default=2)
    lines = [f"{op:<{width}}  {c}" for op, c in counts.most_common()]
    lines.append(f"{'TOTAL':<{width}}  {sum(counts.values())}")
    return "\n".join(lines)


def param_totals(model) -> str:
    import numpy as np

    from numpy_quant_tpu.graph import Constant

    n_tensors = n_params = n_bytes = 0
    for v in model.values:
        if not isinstance(v, Constant) or v.data is None:
            continue
        data = np.asarray(v.data.data)
        n_tensors += 1
        n_params += data.size
        n_bytes += data.nbytes
    return (f"initializers: {n_tensors} tensors, {n_params:,} parameters, "
            f"{n_bytes / 1e6:.2f} MB")


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("model", nargs="?",
                        default="numpy_quant_tpu/models/mlp.onnx",
                        help="path to an .onnx file (default: the "
                             "committed MLP)")
    parser.add_argument("--census", action="store_true",
                        help="also print per-op-type node counts")
    parser.add_argument("--params", action="store_true",
                        help="also print initializer/parameter totals")
    parser.add_argument("--quantize", type=int, metavar="BITS",
                        help="summarize the graph quantized at BITS "
                             "(random-data calibration)")
    parser.add_argument("--fix", action="append", default=[],
                        metavar="DIM=N", help="pin a dynamic dim, e.g. B=1")
    args = parser.parse_args(argv)

    import numpy_quant_tpu as nq

    onnx_model = nq.onnx.load(args.model)
    for spec in args.fix:
        dim, _, val = spec.partition("=")
        nq.onnx.make_dim_param_fixed(onnx_model.graph, dim, int(val))
    model = nq.Model.from_onnx(onnx_model)

    if args.quantize is not None:
        import numpy as np

        rng = np.random.default_rng(0)
        calib = [rng.normal(size=[d if isinstance(d, int) else 1
                                  for d in (inp.shape_hint or (1,))])
                 .astype(np.float32) for inp in model.inputs]
        model = model.quantize(calib, bit_width=args.quantize)

    print(summarize(model))
    if args.census:
        print("\nOp census:")
        print(op_census(model))
    if args.params:
        print("\n" + param_totals(model))
    return 0


if __name__ == "__main__":
    sys.exit(main())
