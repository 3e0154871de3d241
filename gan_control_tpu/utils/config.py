"""JSON config system.

Keeps the EXACT schema of the reference configs (configs/ffhq.json etc. —
sections model_config / training_config / data_config / evaluation_config /
tensorboard_config / monitor_config / ckpt_config) so shipped configs work
unchanged, plus the same experiment-directory contract: the resolved config
is re-exported as ``args.json`` into a timestamped save dir and that file is
the model metadata consumed by inference (reference utils/file_utils.py:28-61,
inference/inference.py:110-119).

Reference behaviors reproduced:
  - attribute access wrapper (``DefaultObj``-like, file_utils.py:9-19)
  - experiment-name mangling from enabled loss weights
    (generator_trainer.py:867-903 ``add_weight_to_name``)
  - timestamped save dir + args.json export (file_utils.py:28-61)
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Mapping


class ConfigObj:
    """Attribute + item access over nested dicts; missing keys -> None."""

    def __init__(self, d: Mapping[str, Any]):
        self._d = dict(d)

    def __getattr__(self, key):
        if key.startswith("_"):
            raise AttributeError(key)
        v = self._d.get(key)
        return ConfigObj(v) if isinstance(v, dict) else v

    def __getitem__(self, key):
        return self._d[key]

    def __contains__(self, key):
        return key in self._d

    def get(self, key, default=None):
        return self._d.get(key, default)

    def keys(self):
        return self._d.keys()

    def items(self):
        return self._d.items()

    def to_dict(self) -> dict:
        return self._d


def read_json(path: str | Path, return_obj: bool = False):
    with open(path) as f:
        d = json.load(f)
    return ConfigObj(d) if return_obj else d


def write_json(d: Mapping[str, Any], path: str | Path):
    with open(path, "w") as f:
        json.dump(d, f, indent=2)


_LOSS_SHORT_NAMES = {
    "embedding_loss": "emb",
    "orientation_loss": "orient",
    "expression_loss": "exp",
    "age_loss": "age",
    "hair_loss": "hair",
    "recon_3d_loss": "r3d",
    "style_loss": "style",
    "dog_id_loss": "dog",
    "classification_loss": "cls",
}


def add_weight_to_name(save_name: str, training_config: Mapping[str, Any]) -> str:
    """Append enabled-loss last-layer weights to the experiment name
    (reference generator_trainer.py:867-903 semantics: the run name encodes
    which losses were on and at what weight)."""
    parts = [save_name]
    for loss, short in _LOSS_SHORT_NAMES.items():
        blk = training_config.get(loss)
        if not isinstance(blk, dict) or not blk.get("enabled"):
            continue
        w = blk.get("last_layer_weight")
        parts.append(f"{short}{w:g}" if isinstance(w, (int, float)) else short)
        if loss == "recon_3d_loss":
            for sub in ("id", "ex", "tex", "angles", "gamma", "xy", "z"):
                sb = blk.get(f"{sub}_loss")
                if isinstance(sb, dict) and sb.get("enabled"):
                    parts.append(f"{sub}{sb.get('last_layer_weight'):g}")
    return "_".join(parts)


def make_save_dir(
    results_dir: str | Path,
    save_name: str,
    config: Mapping[str, Any],
    debug: bool = False,
    timestamp: bool = True,
) -> Path:
    """Create ``results_dir/<save_name>[_debug][_YYmmdd_HHMMSS]`` with the
    reference layout (checkpoint/, images/, graphs/, buckets/) and export
    the resolved config as args.json."""
    name = save_name + ("_debug" if debug else "")
    if timestamp:
        name = name + time.strftime("_%y%m%d_%H%M%S")
    save_dir = Path(results_dir) / name
    for sub in ("checkpoint", "images", "graphs", "buckets"):
        (save_dir / sub).mkdir(parents=True, exist_ok=True)
    write_json(dict(config), save_dir / "args.json")
    return save_dir


def config_checks(config: Mapping[str, Any]) -> list[str]:
    """Config consistency validation (the reference admits
    `TODO: implement config checks`, generator_trainer.py:96-106 — here they
    are actually implemented). Returns a list of problems; empty = OK."""
    problems = []
    mc, tc = config.get("model_config", {}), config.get("training_config", {})
    if mc.get("split_fc") and mc.get("marge_fc"):
        problems.append("split_fc and marge_fc are mutually exclusive")
    if tc.get("batch", 0) % max(tc.get("mini_batch", 1), 1):
        problems.append("batch must be a multiple of mini_batch")
    if tc.get("augment", {}).get("enabled") and tc.get("mini_batch") != tc.get("batch"):
        problems.append("ADA augment requires mini_batch == batch")
    if not mc.get("vanilla", False):
        sgd = tc.get("sub_groups_dict", {})
        latent_total = sum(
            g["place_in_latent"][1] - g["place_in_latent"][0] for g in sgd.values()
        )
        if latent_total != mc.get("latent_size", 512):
            problems.append(
                f"sub_groups_dict latent sizes sum to {latent_total}, "
                f"expected {mc.get('latent_size', 512)}"
            )
        mb_total = sum(
            g["place_in_mini_batch"][1] - g["place_in_mini_batch"][0]
            for g in sgd.values()
            if g.get("place_in_mini_batch") is not None
        )
        if tc.get("mini_batch_mode", "normal") == "normal" and mb_total != tc.get("mini_batch"):
            problems.append(
                f"sub_groups_dict mini-batch slots sum to {mb_total}, "
                f"expected mini_batch={tc.get('mini_batch')}"
            )
        if tc.get("mini_batch_mode") == "random" and tc.get("mini_batch") != tc.get("batch"):
            problems.append("random mini_batch_mode requires mini_batch == batch")
    size = mc.get("size", 512)
    if size not in (256, 512, 896, 1024) and (size & (size - 1)):
        problems.append(f"size {size} is not a power of 2 (or 896)")
    return problems
