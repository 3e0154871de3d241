"""Phase-1 CLI: train the disentangled GAN.

Usage (reference contract, train_generator.py):
    python train_generator.py --config_path gan_control_tpu/configs/ffhq.json
"""

import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", type=str, required=True)
    parser.add_argument("--iters", type=int, default=None,
                        help="override training_config.iter")
    args = parser.parse_args()

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
