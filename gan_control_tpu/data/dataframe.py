"""Phase-2b dataset: the attributes DataFrame -> (controls, w-latents).

Behavior contract: datasets/dataframe_dataset.py:18-56 in the reference —
pickle DataFrame with one row per generated sample; columns hold the
predictor outputs (age, orientation, expression_q, hair, gamma3d,
expression3d, orientation3d, arcface_emb) plus 'latents_w'; 90/10
train/eval split by row order (:23-26); 'expression_q' returned one-hot
(:37). Column mapping from loss name: controller_trainer.py:143-152."""

from __future__ import annotations

from pathlib import Path
from typing import Iterator

import numpy as np

ATTRIBUTE_COLUMNS = {
    "age_loss": "age",
    "orientation_loss": "orientation",
    "hair_loss": "hair",
    "gamma_loss": "gamma3d",
    "recon_gamma_loss": "gamma3d",
    # expression picks the column by controller in_dim: 64 -> expression3d,
    # 8 -> expression_q (reference controller_trainer.py:146-149)
    "expression_loss_64": "expression3d",
    "expression_loss_8": "expression_q",
}

NUM_EXPRESSION_CLASSES = 8


def attribute_column_for(loss_name: str, in_dim: int | None = None) -> str:
    if loss_name == "expression_loss":
        if in_dim is not None and in_dim not in (64, 8):
            # reference validation (controller_trainer.py:148-149): fail at
            # init, not as a Dense shape mismatch in the first jitted step
            raise ValueError(
                f"expression_loss in_dim must be 8 (expression_q) or 64 "
                f"(expression3d), got {in_dim}"
            )
        return "expression3d" if (in_dim or 64) == 64 else "expression_q"
    if loss_name in ATTRIBUTE_COLUMNS:
        return ATTRIBUTE_COLUMNS[loss_name]
    raise ValueError(f"no attribute column mapping for {loss_name}")


class DataFrameDataset:
    """Materializes (controls [N,D], latents_w [N,512]) as numpy arrays."""

    def __init__(self, df_path: str | Path, attribute: str, train: bool = True,
                 eval_fraction: float = 0.1):
        import pandas as pd

        df = pd.read_pickle(df_path)
        n = len(df)
        split = int(n * (1 - eval_fraction))
        rows = df.iloc[:split] if train else df.iloc[split:]

        controls = np.stack([np.asarray(v, np.float32).ravel() for v in rows[attribute]])
        if attribute == "expression_q":
            onehot = np.zeros((len(controls), NUM_EXPRESSION_CLASSES), np.float32)
            onehot[np.arange(len(controls)), controls.astype(int).ravel()] = 1.0
            controls = onehot
        latents = np.stack([np.asarray(v, np.float32).ravel() for v in rows["latents_w"]])
        self.controls = controls
        self.latents_w = latents

    def __len__(self):
        return len(self.controls)

    def __getitem__(self, i: int) -> tuple[np.ndarray, np.ndarray]:
        return self.controls[i], self.latents_w[i]


class MergedDataFrameDataset:
    """All-attribute variant: (controls dict, latents_w) per row — for a
    merged controller over a vanilla (non-partitioned-latent) generator
    (reference datasets/merged_dataframe_dataset.py MergedDataFrameDataSet;
    its default column set is arcface_emb/orientation/gamma3d/hair/age/
    expression3d, :30-40)."""

    def __init__(self, df_path: str | Path, attributes: list[str],
                 train: bool = True, eval_fraction: float = 0.1):
        import pandas as pd

        df = pd.read_pickle(df_path)
        split = int(len(df) * (1 - eval_fraction))
        rows = df.iloc[:split] if train else df.iloc[split:]
        self.controls = {}
        for attr in attributes:
            vals = np.stack([np.asarray(v, np.float32).ravel() for v in rows[attr]])
            if attr == "expression_q":
                onehot = np.zeros((len(vals), NUM_EXPRESSION_CLASSES), np.float32)
                onehot[np.arange(len(vals)), vals.astype(int).ravel()] = 1.0
                vals = onehot
            self.controls[attr] = vals
        self.latents_w = np.stack(
            [np.asarray(v, np.float32).ravel() for v in rows["latents_w"]]
        )

    def __len__(self):
        return len(self.latents_w)


def get_merged_dataframe_data_loader(
    df_path: str | Path,
    attributes: list[str],
    batch_size: int,
    train: bool = True,
    seed: int = 0,
) -> tuple[Iterator[tuple[dict, np.ndarray]], MergedDataFrameDataset]:
    """Infinite shuffled ({attribute: controls}, w) batches — the merged
    (all-attribute) counterpart of :func:`get_dataframe_data_loader`
    (reference merged_dataframe_dataset.get_dataframe_data_loader:46-56)."""
    ds = MergedDataFrameDataset(df_path, attributes, train=train)
    rng = np.random.default_rng(seed)
    bs = min(batch_size, len(ds))
    if bs < 1:
        raise ValueError(f"empty DataFrame split (train={train}) in {df_path}")

    def gen():
        while True:
            perm = rng.permutation(len(ds))
            for s in range(0, len(perm) - bs + 1, bs):
                idx = perm[s : s + bs]
                yield (
                    {a: v[idx] for a, v in ds.controls.items()},
                    ds.latents_w[idx],
                )

    return gen(), ds


def get_dataframe_data_loader(
    df_path: str | Path,
    attribute: str,
    batch_size: int,
    train: bool = True,
    seed: int = 0,
) -> tuple[Iterator[tuple[np.ndarray, np.ndarray]], DataFrameDataset]:
    """Infinite shuffled (controls, w) batches + the dataset object."""
    ds = DataFrameDataset(df_path, attribute, train=train)
    rng = np.random.default_rng(seed)
    # never exceed the dataset (a 50-row eval batch over a 20-row split
    # would otherwise produce an empty epoch and an infinite spin)
    bs = min(batch_size, len(ds))
    if bs < 1:
        raise ValueError(f"empty DataFrame split (train={train}) in {df_path}")

    def gen():
        while True:
            perm = rng.permutation(len(ds))
            for s in range(0, len(perm) - bs + 1, bs):
                idx = perm[s : s + bs]
                yield ds.controls[idx], ds.latents_w[idx]

    return gen(), ds
