from cspn_monodepth_tpu.train.loss import masked_mse_loss, masked_l1_loss, get_loss_fn
from cspn_monodepth_tpu.train.metrics import (
    MetricSums,
    metric_sums_from_batch,
    finalize_metrics,
    AverageMeter,
)

__all__ = [
    "masked_mse_loss",
    "masked_l1_loss",
    "get_loss_fn",
    "MetricSums",
    "metric_sums_from_batch",
    "finalize_metrics",
    "AverageMeter",
]
