#!/usr/bin/env python
"""Profile comparison CLI (reference: extra/evaluate_profile_results.py).

Runs a model's FLOAT and QUANTIZED executors in eager profile mode on
random inputs, prints both per-op-type timing dicts, and renders the
reference-style terminal bar chart comparing them (top-N op types of
the quantized run, float beside each).

The profile dicts can be saved to / reloaded from JSON, so a chart can
be re-rendered (or two saved runs compared) without re-running a model::

    python extras/evaluate_profile_results.py model.onnx --bits 8
    python extras/evaluate_profile_results.py model.onnx --save prof.json
    python extras/evaluate_profile_results.py --load prof.json

The jitted (non-eager) execution mode has no per-op wall clock -- use
``extras/profile_forward.py`` (XLA device trace) for that path.
"""
import argparse
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from numpy_quant_tpu.utils.profiling import profile_results_plot  # noqa: E402


def run_profiles(path: str, bits: int, fix: list, batch_seed: int = 0):
    import numpy as np

    import numpy_quant_tpu as nq

    onnx_model = nq.onnx.load(path)
    for spec in fix:
        dim, _, val = spec.partition("=")
        nq.onnx.make_dim_param_fixed(onnx_model.graph, dim, int(val))
    model = nq.Model.from_onnx(onnx_model)

    rng = np.random.default_rng(batch_seed)
    inputs = [rng.normal(size=[d if isinstance(d, int) else 1
                               for d in (inp.shape_hint or (1,))])
              .astype(np.float32) for inp in model.inputs]
    _, fprof = model(inputs, profile=True)
    qmodel = model.quantize(inputs, bit_width=bits)
    _, qprof = qmodel(inputs, profile=True)
    return fprof, qprof


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("model", nargs="?",
                        default="numpy_quant_tpu/models/mlp.onnx",
                        help="path to an .onnx file (default: the "
                             "committed MLP)")
    parser.add_argument("--bits", type=int, default=8,
                        help="quantization bit width (default 8)")
    parser.add_argument("--fix", action="append", default=[],
                        metavar="DIM=N", help="pin a dynamic dim, e.g. B=1")
    parser.add_argument("--top", type=int, default=5,
                        help="op types to chart (default 5)")
    parser.add_argument("--save", metavar="OUT.json",
                        help="write both profile dicts to a JSON file")
    parser.add_argument("--load", metavar="IN.json",
                        help="chart a previously saved JSON instead of "
                             "running the model")
    args = parser.parse_args(argv)

    if args.load:
        with open(args.load) as fh:
            saved = json.load(fh)
        fprof, qprof = saved["float"], saved["quantized"]
    else:
        fprof, qprof = run_profiles(args.model, args.bits, args.fix)
        if args.save:
            with open(args.save, "w") as fh:
                json.dump({"float": fprof, "quantized": qprof}, fh, indent=1)
            print(f"saved profiles to {args.save}")

    print("float   :", {k: round(v, 6) for k, v in fprof.items()})
    print("quantized:", {k: round(v, 6) for k, v in qprof.items()})
    profile_results_plot(fprof, qprof, show=args.top)
    return 0


if __name__ == "__main__":
    sys.exit(main())
