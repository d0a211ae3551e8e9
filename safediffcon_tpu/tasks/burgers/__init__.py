from safediffcon_tpu.tasks.burgers.task import (
    SCALER,
    NT,
    NX,
    PAD_SIZE,
    COND_IDX,
    BurgersConditioner,
    guidance_values,
    guidance_grad_fn,
    safety_statistic,
    shift_weights,
)

__all__ = [
    "SCALER",
    "NT",
    "NX",
    "PAD_SIZE",
    "COND_IDX",
    "BurgersConditioner",
    "guidance_values",
    "guidance_grad_fn",
    "safety_statistic",
    "shift_weights",
]
