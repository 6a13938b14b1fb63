"""Data layer (reference L6, `pointnet2/dataset.py` +
`shapenet_psr_dataloader/`): pure-numpy datasets + a thread-prefetching batch
loader.  No torch dependency — batches are numpy dicts handed straight to
`jax.device_put` / `make_array_from_process_local_data`.
"""

from slide_tpu.data.shapenet_psr import (
    ShapesPSRDataset,
    augment_points_with_normal,
    load_metadata,
)
from slide_tpu.data.dummy import DummyShapesDataset, DummyLabelDataset
from slide_tpu.data.npz_dataset import ShapeNpzDataset, GeneralNpzDataset
from slide_tpu.data.loader import BatchLoader, get_dataloader
from slide_tpu.data.synthetic import write_synthetic_shapenet_psr

__all__ = [
    "ShapesPSRDataset", "augment_points_with_normal", "load_metadata",
    "DummyShapesDataset", "DummyLabelDataset", "ShapeNpzDataset",
    "GeneralNpzDataset", "BatchLoader", "get_dataloader",
    "write_synthetic_shapenet_psr",
]
