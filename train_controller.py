"""Phase-2b CLI: train a per-attribute control encoder.

Usage (reference contract, train_controller.py):
    python train_controller.py --config_path <controller_config.json>
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
    parser.add_argument("--iters", type=int, default=None)
    args = parser.parse_args()
    _setup_cache()

    from gan_control_tpu.trainers.controller_trainer import ControllerTrainer

    trainer = ControllerTrainer(config_path=args.config_path)
    trainer.train(args.iters)


if __name__ == "__main__":
    main()
