from cspn_monodepth_tpu.data.transforms import train_transform, val_transform
from cspn_monodepth_tpu.data.datasets import (
    NYUDataset,
    KITTIDataset,
    SyntheticDataset,
    make_dataset,
)
from cspn_monodepth_tpu.data.pipeline import make_train_iterator, make_eval_iterator

__all__ = [
    "train_transform",
    "val_transform",
    "NYUDataset",
    "KITTIDataset",
    "SyntheticDataset",
    "make_dataset",
    "make_train_iterator",
    "make_eval_iterator",
]
