from .parity import compare_all_values, record_all_values
from .profiling import (device_trace, profile_results_plot,
                        summarize_device_trace)
from .serialization import (
    export_qdq,
    export_qoperator,
    load_calibration_stats,
    merge_calibration_stats,
    load_qmodel,
    save_calibration_stats,
    save_qmodel,
    save_weight_only,
    load_weight_only,
    save_qmodel_qdq,
    save_qmodel_qoperator,
)
from .analyzer import print_quantization_report, quantization_report
from .generate import (beam_search, decode_calibration, generate,
                       generate_mamba, mamba_decode_calibration,
                       generate_kv, generate_seq2seq,
                       generate_speculative)
from .calibration import kl_calibrated_stats, mse_clipped_stats
from .serving import ContinuousBatcher
from .aot import (load_compiled, load_decode_loop, save_compiled,
                  save_decode_loop)
from .sensitivity import plan_mixed_precision, weight_sensitivity
from .summary import summarize
