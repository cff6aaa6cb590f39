from .parity import compare_all_values, record_all_values
from .summary import summarize
