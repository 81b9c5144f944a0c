from splade_tpu.losses.v33 import (
    LossMetrics,
    flops_loss,
    infonce_loss,
    kl_kd_loss,
    lambda_schedule,
    margin_mse_loss,
    v33_loss,
)
from splade_tpu.losses.schedules import (
    QuadraticLambdaScheduler,
    LinearLambdaScheduler,
    ExponentialLambdaScheduler,
)

__all__ = [
    "LossMetrics",
    "flops_loss",
    "infonce_loss",
    "kl_kd_loss",
    "lambda_schedule",
    "margin_mse_loss",
    "v33_loss",
    "QuadraticLambdaScheduler",
    "LinearLambdaScheduler",
    "ExponentialLambdaScheduler",
]
