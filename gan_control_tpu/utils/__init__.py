"""Cross-cutting utilities: config, logging, checkpoints."""
