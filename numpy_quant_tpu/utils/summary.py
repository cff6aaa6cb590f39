"""ASCII model summary table.

Format-compatible with the reference summarizer
(reference: extra/model_summary.py:4-44) -- the exact string is asserted
in tests, mirroring reference: test/test_mlp.py:84-102.
"""
from __future__ import annotations


def summarize(model) -> str:
    node_names = [node.name for node in model.nodes]
    node_inputs = [node.inputs for node in model.nodes]
    node_outputs = [node.outputs for node in model.nodes]

    c0 = max(len(n) for n in node_names)
    c1 = max(max((len(t.name) for t in i), default=0) for i in node_inputs)
    c2 = max(max((len(t.name) for t in o), default=0) for o in node_outputs)
    c0 = max(c0, len("Node"))
    c1 = max(c1, len("Inputs"))
    c2 = max(c2, len("Outputs"))

    header_sep = "=" * c0 + "=+=" + "=" * c1 + "=+=" + "=" * c2 + "\n"
    row_sep = "-" * c0 + "-+-" + "-" * c1 + "-+-" + "-" * c2 + "\n"

    out = header_sep
    out += f"{'Node':<{c0}} | {'Inputs':<{c1}} | {'Outputs':<{c2}}\n"
    out += header_sep

    for node in model.nodes:
        inp_ind, out_ind = 0, 0
        out += f"{node.name:<{c0}}"
        while True:
            if not (inp_ind == 0 and out_ind == 0):
                out += " " * c0
            if inp_ind < len(node.inputs):
                out += f" | {node.inputs[inp_ind].name:<{c1}}"
                inp_ind += 1
            else:
                out += " | " + " " * c1
            if out_ind < len(node.outputs):
                out += f" | {node.outputs[out_ind].name:<{c2}}"
                out_ind += 1
            else:
                out += " | " + " " * c2
            out += "\n"
            if not (inp_ind < len(node.inputs) or out_ind < len(node.outputs)):
                break
        out += row_sep
    return out
