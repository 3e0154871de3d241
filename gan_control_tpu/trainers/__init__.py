"""Trainer orchestration layer (CLI-facing): GeneratorTrainer (phase 1),
ControllerTrainer (phase 2b)."""
