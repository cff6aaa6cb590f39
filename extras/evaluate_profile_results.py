"""Profile comparison chart (reference: extra/evaluate_profile_results.py)."""
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from numpy_quant_tpu.utils.profiling import profile_results_plot  # noqa: E402,F401
