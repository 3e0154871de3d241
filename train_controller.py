"""Phase-2b CLI: train a per-attribute control encoder.

Usage (reference contract, train_controller.py):
    python train_controller.py --config_path <controller_config.json>
"""

import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", type=str, required=True)
    parser.add_argument("--iters", type=int, default=None)
    args = parser.parse_args()

    from gan_control_tpu.trainers.controller_trainer import ControllerTrainer

    trainer = ControllerTrainer(config_path=args.config_path)
    trainer.train(args.iters)


if __name__ == "__main__":
    main()
