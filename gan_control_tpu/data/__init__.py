"""L6 data layer: host-side image pipelines feeding numpy batches.

Reference: datasets/ (ffhq_dataset.py, afhq_dataset.py, metfaces_dataset.py,
dataframe_dataset.py). torch DataLoader workers are replaced by a
thread-pool prefetcher handing ready NHWC numpy batches to
``jax.device_put`` (SURVEY.md §7.1)."""

from gan_control_tpu.data.datasets import (
    ImageFolderDataset,
    get_ffhq_data_loader,
    get_afhq_data_loader,
    get_metfaces_data_loader,
    synthetic_data_loader,
)
from gan_control_tpu.data.dataframe import DataFrameDataset, get_dataframe_data_loader
