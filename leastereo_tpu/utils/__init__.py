from .classic_eval import midd_eval_average, midd_eval_sample
from .checkpoint import latest_step, restore_checkpoint, save_checkpoint, tolerant_merge
from .colorize import colorize_disparity, turbo_colormap
from .experiment import EarlyStopping, ExperimentSaver
from .profiling import (
    cost_analysis,
    count_params,
    device_peak_hbm_gb,
    model_flops,
    param_size_mb,
    peak_hbm_gb,
)

__all__ = [
    "midd_eval_average",
    "midd_eval_sample",
    "latest_step",
    "restore_checkpoint",
    "save_checkpoint",
    "tolerant_merge",
    "colorize_disparity",
    "turbo_colormap",
    "EarlyStopping",
    "ExperimentSaver",
    "cost_analysis",
    "count_params",
    "model_flops",
    "param_size_mb",
]
