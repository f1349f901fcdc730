"""Host-side data pipeline: manifests, bucketed datasets, threaded loading."""

from ragb_vae_tpu.data.bucket_dataset import MixedBucketDataset
from ragb_vae_tpu.data.component_dataset import (
    RgbaComponentDataset,
    create_component_dataloader,
)
from ragb_vae_tpu.data.image_io import load_rgba, pil_to_array, save_rgba
from ragb_vae_tpu.data.loader import DataLoader, default_collate, device_prefetch, pad_collate
from ragb_vae_tpu.data.manifest import build_bucket_entries
from ragb_vae_tpu.data.multilayer_dataset import (
    MultiLayerDataset,
    MultiLayerSample,
    multilayer_collate,
)
from ragb_vae_tpu.data.sampler import BucketBatchSampler
from ragb_vae_tpu.data.text_alpha_dataset import TextAlphaBucketDataset
from ragb_vae_tpu.data.transforms import RandomBackgroundBlend

__all__ = [
    "BucketBatchSampler",
    "DataLoader",
    "MixedBucketDataset",
    "MultiLayerDataset",
    "MultiLayerSample",
    "RandomBackgroundBlend",
    "RgbaComponentDataset",
    "TextAlphaBucketDataset",
    "build_bucket_entries",
    "create_component_dataloader",
    "default_collate",
    "device_prefetch",
    "load_rgba",
    "multilayer_collate",
    "pad_collate",
    "pil_to_array",
    "save_rgba",
]
