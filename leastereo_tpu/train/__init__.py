from .losses import (
    edge_aware_smoothness_loss,
    gradient_aware_loss,
    masked_smooth_l1,
    validity_mask,
)
from .metrics import bad_pixel_frac, epe, three_px_error
from .step import TrainState, make_eval_step, make_lr_schedule, make_optimizer, make_train_step, multistep_lr

__all__ = [
    "edge_aware_smoothness_loss",
    "gradient_aware_loss",
    "masked_smooth_l1",
    "validity_mask",
    "bad_pixel_frac",
    "epe",
    "three_px_error",
    "TrainState",
    "make_eval_step",
    "make_lr_schedule",
    "make_optimizer",
    "make_train_step",
    "multistep_lr",
]
