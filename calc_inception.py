"""CLI: compute the real-dataset inception statistics pickle used by FID.

Reference contract: fid_utils/calc_inception.py:60-77 — iterate the real
dataset, extract InceptionV3 pool3 features, save {'mean','cov'} pickle the
evaluate_fid step consumes.

Usage:
    python calc_inception.py --path data/ffhq/images1024x1024 \
        --size 512 --n_samples 50000 --save_path resources/inception_stats/inception_ffhq_512x512.pkl
    # --inception_weights <torchvision inception .pth> for pretrained parity
"""

import argparse


def _setup_cache():
    """Persistent XLA compile cache (compiles over a remote-TPU link are
    minutes each; the cache makes reruns instant)."""
    import os

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("GANCTL_COMPILE_CACHE", "/tmp/gan_control_compile_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--path", type=str, required=True)
    parser.add_argument("--size", type=int, default=512)
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--n_samples", type=int, default=50_000)
    parser.add_argument("--save_path", type=str, required=True)
    parser.add_argument("--inception_weights", type=str, default=None)
    args = parser.parse_args()
    _setup_cache()

    import numpy as np
    import jax

    from gan_control_tpu.data.datasets import ImageFolderDataset, infinite_loader, list_images
    from gan_control_tpu.evaluation import fid as fid_lib
    from gan_control_tpu.evaluation import inception

    if args.inception_weights:
        params = inception.convert_torch_weights(args.inception_weights)
    else:
        print("WARNING: random inception weights — stats are only self-consistent")
        params = inception.init_params(jax.random.PRNGKey(42))
    feature_fn = fid_lib.make_feature_fn(params)

    ds = ImageFolderDataset(list_images(args.path), size=args.size, hflip=False)
    loader = infinite_loader(ds, args.batch, workers=4)

    def to01(batches):
        for b in batches:
            yield (b + 1.0) * 0.5

    # shard the sweep over the device mesh when the batch divides evenly —
    # the jitted feature program partitions over the data axis
    from gan_control_tpu.utils.mesh import data_batch_sharding

    sharding = data_batch_sharding(args.batch, label="inception stats sweep")

    feats = fid_lib.extract_features(feature_fn, to01(loader), args.n_samples,
                                     args.batch, sharding=sharding)
    mean, cov = fid_lib.compute_stats(feats)
    fid_lib.save_stats(args.save_path, mean, cov)
    print(f"saved stats ({feats.shape[0]} samples) -> {args.save_path}")


if __name__ == "__main__":
    main()
