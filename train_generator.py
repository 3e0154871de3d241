"""Phase-1 CLI: train the disentangled GAN.

Usage (reference contract, train_generator.py):
    python train_generator.py --config_path gan_control_tpu/configs/ffhq.json
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
    parser.add_argument("--config_path", type=str, required=True)
    parser.add_argument("--iters", type=int, default=None,
                        help="override training_config.iter")
    args = parser.parse_args()
    _setup_cache()

    from gan_control_tpu.trainers.generator_trainer import GeneratorTrainer
    from gan_control_tpu.losses.registry import build_attr_losses
    from gan_control_tpu.utils.config import read_json

    config = read_json(args.config_path)
    attr_losses, predictor_params = build_attr_losses(config["training_config"])
    trainer = GeneratorTrainer(
        config=config, attr_losses=attr_losses, predictor_params=predictor_params
    )
    trainer.dry_run()
    trainer.train(args.iters)


if __name__ == "__main__":
    main()
