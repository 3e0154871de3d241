"""Image-folder datasets + infinite prefetching loaders.

Behavior contracts:
  - FFHQ (reference datasets/ffhq_dataset.py:17-79): recursive image folder,
    Resize(size) when size != native, RandomHorizontalFlip, normalize
    mean/std 0.5 -> [-1, 1]; infinite generator (``sample_data`` :50-54).
  - AFHQ (afhq_dataset.py): DOG classes only (train+val dog dirs),
    RandomResizedCrop(p=0.5, scale (0.8, 1.0)) + resize + flip.
  - MetFaces (metfaces_dataset.py): recursive glob + resize + flip.

TPU-first: loaders yield NHWC float32 numpy batches ready for
``jax.device_put`` with a batch sharding; decode/augment runs in a
background thread pool (the torch-DataLoader-worker replacement)."""

from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Iterator, Sequence

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None

IMG_EXTENSIONS = {".jpg", ".jpeg", ".png", ".bmp", ".webp"}


def list_images(root: str | Path) -> list[Path]:
    root = Path(root)
    return sorted(
        p for p in root.rglob("*") if p.suffix.lower() in IMG_EXTENSIONS
    )


class ImageFolderDataset:
    """Decode -> (optional random-resized-crop) -> resize -> flip -> [-1,1]."""

    def __init__(
        self,
        paths: Sequence[Path],
        size: int,
        hflip: bool = True,
        random_resized_crop_p: float = 0.0,
    ):
        if Image is None:
            raise RuntimeError("PIL is required for image datasets")
        if not paths:
            raise ValueError("empty dataset")
        self.paths = list(paths)
        self.size = size
        self.hflip = hflip
        self.rrc_p = random_resized_crop_p

    def __len__(self):
        return len(self.paths)

    def load(self, idx: int, rng: np.random.Generator) -> np.ndarray:
        img = Image.open(self.paths[idx]).convert("RGB")
        if self.rrc_p > 0 and rng.random() < self.rrc_p:
            # torchvision RandomResizedCrop(scale=(0.8,1.0), ratio=(0.9,1.1))
            # sampling (the reference's AFHQ augment, afhq_dataset.py):
            # AREA fraction uniform in scale, aspect LOG-uniform in ratio,
            # up to 10 attempts then a center-crop fallback
            w, h = img.size
            area = w * h
            for _ in range(10):
                target_area = area * rng.uniform(0.8, 1.0)
                aspect = np.exp(rng.uniform(np.log(0.9), np.log(1.1)))
                cw = int(round(np.sqrt(target_area * aspect)))
                ch = int(round(np.sqrt(target_area / aspect)))
                if 0 < cw <= w and 0 < ch <= h:
                    x0 = rng.integers(0, w - cw + 1)
                    y0 = rng.integers(0, h - ch + 1)
                    img = img.crop((x0, y0, x0 + cw, y0 + ch))
                    break
            else:
                side = min(w, h)
                x0, y0 = (w - side) // 2, (h - side) // 2
                img = img.crop((x0, y0, x0 + side, y0 + side))
        if img.size != (self.size, self.size):
            img = img.resize((self.size, self.size), Image.BILINEAR)
        arr = np.asarray(img, np.float32) / 127.5 - 1.0  # HWC in [-1,1]
        if self.hflip and rng.random() < 0.5:
            arr = arr[:, ::-1]
        return arr


def infinite_loader(
    dataset: ImageFolderDataset,
    batch_size: int,
    workers: int = 4,
    seed: int = 0,
    prefetch: int = 2,
    shard_index: int = 0,
    num_shards: int = 1,
) -> Iterator[np.ndarray]:
    """Infinite shuffled NHWC batches with background decoding.

    Multi-host sharding (``num_shards`` = process count): every host runs
    the SAME shuffle stream (same seed — no coordination needed), each
    GLOBAL batch of ``batch_size`` indices is sliced into contiguous
    per-host rows, and each host decodes ONLY its ``batch_size //
    num_shards`` slice — 1/N of the IO per host. Because the per-image
    augmentation rng is keyed by (batch_seed, image index), host h's rows
    are bit-identical to rows [h*local:(h+1)*local] of the single-host
    batch: concatenating the shards reproduces the unsharded stream
    exactly. (This fills the reference's dead DistributedSampler slot,
    ffhq_dataset.py:39-47.)"""
    if batch_size % num_shards:
        raise ValueError(f"batch {batch_size} not divisible by {num_shards} shards")
    if not (0 <= shard_index < num_shards):
        raise ValueError(f"shard_index {shard_index} not in [0, {num_shards})")
    local = batch_size // num_shards
    order_rng = np.random.default_rng(seed)
    pool = ThreadPoolExecutor(max_workers=max(workers, 1))
    q: queue.Queue = queue.Queue(maxsize=prefetch)
    stop = threading.Event()

    def make_batch(indices, batch_seed):
        rngs = [np.random.default_rng((batch_seed, int(i))) for i in indices]
        imgs = list(pool.map(dataset.load, indices, rngs))
        return np.stack(imgs, axis=0)

    if len(dataset) < batch_size:
        raise ValueError(
            f"dataset has {len(dataset)} images < batch_size {batch_size}: "
            f"the epoch loop would never yield a batch"
        )

    def producer():
        epoch = 0
        try:
            while not stop.is_set():
                perm = order_rng.permutation(len(dataset))
                for s in range(0, len(perm) - batch_size + 1, batch_size):
                    if stop.is_set():
                        return
                    idx = perm[s : s + batch_size][
                        shard_index * local : (shard_index + 1) * local
                    ]
                    # the augment rng stays keyed by the GLOBAL batch offset
                    # + image index, so shards match the unsharded stream
                    q.put(make_batch(idx, epoch * 1_000_003 + s))
                epoch += 1
        except BaseException as e:  # noqa: BLE001 — relayed to the consumer
            # a decode/IO error must surface at next(loader), NOT kill this
            # thread silently (which would leave the train loop blocked on
            # q.get forever); after close() it's just teardown noise
            if not stop.is_set():
                q.put(e)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        # unblock a producer stuck in q.put so it can observe stop and
        # exit before e.g. a TemporaryDirectory holding the images vanishes
        while True:
            try:
                q.get_nowait()
            except queue.Empty:
                break
        t.join(timeout=5)
        pool.shutdown(wait=False, cancel_futures=True)


def get_ffhq_data_loader(
    data_config: dict, batch_size: int, size: int, seed: int = 0,
    shard_index: int = 0, num_shards: int = 1,
) -> Iterator[np.ndarray]:
    ds = ImageFolderDataset(list_images(data_config["path"]), size=size)
    return infinite_loader(ds, batch_size, workers=int(data_config.get("workers", 4)),
                           seed=seed, shard_index=shard_index, num_shards=num_shards)


def get_afhq_data_loader(
    data_config: dict, batch_size: int, size: int, seed: int = 0,
    shard_index: int = 0, num_shards: int = 1,
) -> Iterator[np.ndarray]:
    """Dog images only: <path>/train/dog + <path>/val/dog (reference
    afhq_dataset.py:33-34), with random-resized-crop p=0.5."""
    root = Path(data_config["path"])
    paths = []
    for split in ("train", "val"):
        d = root / split / "dog"
        if d.is_dir():
            paths.extend(list_images(d))
    if not paths:  # fall back to flat layout
        paths = list_images(root)
    ds = ImageFolderDataset(paths, size=size, random_resized_crop_p=0.5)
    return infinite_loader(ds, batch_size, workers=int(data_config.get("workers", 4)),
                           seed=seed, shard_index=shard_index, num_shards=num_shards)


def get_metfaces_data_loader(
    data_config: dict, batch_size: int, size: int, seed: int = 0,
    shard_index: int = 0, num_shards: int = 1,
) -> Iterator[np.ndarray]:
    ds = ImageFolderDataset(list_images(data_config["path"]), size=size)
    return infinite_loader(ds, batch_size, workers=int(data_config.get("workers", 4)),
                           seed=seed, shard_index=shard_index, num_shards=num_shards)


def synthetic_data_loader(
    batch_size: int, size: int, seed: int = 0,
    shard_index: int = 0, num_shards: int = 1,
) -> Iterator[np.ndarray]:
    """Deterministic fake-image stream for tests / dry runs / benches.
    Sharded hosts replay the same stream and take their contiguous row
    slice, so the shards concatenate to the unsharded batch exactly."""
    if batch_size % num_shards:
        raise ValueError(f"batch {batch_size} not divisible by {num_shards} shards")
    local = batch_size // num_shards
    rng = np.random.default_rng(seed)
    while True:
        full = rng.standard_normal((batch_size, size, size, 3)).astype(np.float32) * 0.5
        yield full[shard_index * local : (shard_index + 1) * local]


def get_data_loader(
    data_config: dict, batch_size: int, size: int, seed: int = 0,
    shard_index: int = 0, num_shards: int = 1,
) -> Iterator[np.ndarray]:
    """Dispatch on data_set_name (reference GeneratorTrainer.init_data_set,
    generator_trainer.py:205-216). Prefers the native C++ decode pipeline
    (native/gcdata.cpp) when built and the dataset is JPEG/PNG.

    ``batch_size`` is the GLOBAL batch; with ``num_shards`` > 1 (multi-host)
    each host's loader yields its ``batch_size // num_shards`` row slice
    (see infinite_loader). The native path shards the FILE LIST round-robin
    instead (its shuffle lives in C++): statistically equivalent and
    IO-disjoint, but not bit-identical to the single-host stream."""
    name = data_config.get("data_set_name", "ffhq")
    if batch_size % num_shards:
        raise ValueError(
            f"global batch {batch_size} not divisible by {num_shards} hosts"
        )
    if name == "synthetic":
        return synthetic_data_loader(batch_size, size, seed,
                                     shard_index=shard_index, num_shards=num_shards)
    if not os.path.isdir(str(data_config.get("path", ""))):
        # NEVER fall back silently: training the discriminator against
        # Gaussian noise because of a typo'd path burns hours producing
        # garbage (the reference raises here too)
        raise FileNotFoundError(
            f"data_config.path {data_config.get('path')!r} is not a "
            f"directory; set data_set_name='synthetic' for smoke runs"
        )

    if data_config.get("native", True):
        from gan_control_tpu.data import native_loader as nl

        if nl.available():
            if name == "afhq":
                root = Path(data_config["path"])
                paths = [
                    p for split in ("train", "val")
                    for p in list_images(root / split / "dog")
                ] or list_images(root)
                rrc_p = 0.5
            else:
                paths = list_images(data_config["path"])
                rrc_p = 0.0
            if paths and all(
                p.suffix.lower() in (".jpg", ".jpeg", ".png") for p in paths
            ):
                if num_shards > 1:
                    # round-robin file split: disjoint per-host IO; the C++
                    # shuffle runs per-host over its own file subset
                    paths = paths[shard_index::num_shards]
                return nl.native_loader(
                    paths, size, batch_size // num_shards,
                    workers=int(data_config.get("workers", 4)),
                    seed=seed, random_resized_crop_p=rrc_p,
                )

    kw = dict(shard_index=shard_index, num_shards=num_shards)
    if name == "ffhq":
        return get_ffhq_data_loader(data_config, batch_size, size, seed, **kw)
    if name == "afhq":
        return get_afhq_data_loader(data_config, batch_size, size, seed, **kw)
    if name == "metfaces":
        return get_metfaces_data_loader(data_config, batch_size, size, seed, **kw)
    raise ValueError(f"unknown data_set_name {name}")
