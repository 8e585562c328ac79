"""Data layer: host decode + device-side geometric preprocessing."""

from .preprocess import RawBatch, preprocess_batch, model_input
from .rhd import RHDDataset, write_synthetic_rhd
from .synthetic import fake_sample_batch
from .pipeline import (prefetch, prefetch_map, device_batches,
                       raw_device_batches)

__all__ = [
    "RawBatch", "preprocess_batch", "model_input",
    "RHDDataset", "write_synthetic_rhd", "fake_sample_batch",
    "prefetch", "prefetch_map", "device_batches", "raw_device_batches",
]
