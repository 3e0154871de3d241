"""Tracker — training-time observability hub.

Behavior contract (reference evaluation/tracker.py):
  - iteration timing: min / max / rolling-200 mean, logged as JSON (:61-79);
  - fixed-latent sample grids (:82-87) and per-group matrix grids (:89-116);
  - FID every fid_interval with best-FID flag (:322-347);
  - separability per configured loss (:185-311);
  - write_stats -> scalar sink (:349-353).

TPU-first: scalar metrics are appended to a JSONL file (and TensorBoard via
torch.utils.tensorboard when available) — the JSONL is the source of truth
so the tracker has no hard torch dependency."""

from __future__ import annotations

import json
import time
from collections import deque
from pathlib import Path
from typing import Any

import numpy as np

from gan_control_tpu.utils.logging_utils import get_logger

_log = get_logger(__name__)


class Tracker:
    def __init__(
        self,
        save_dir: str | Path | None = None,
        tensorboard: bool = False,
        rolling: int = 200,
        csv_monitor: bool = False,
    ):
        # csv_monitor: the reference's monitor_config hook references a CSV
        # monitor it never constructs (generator_trainer.py:732-733 would
        # crash if enabled); here it works.
        self._csv = csv_monitor
        self._csv_fields: list[str] = []
        self.save_dir = Path(save_dir) if save_dir else None
        self.iter_times: deque[float] = deque(maxlen=rolling)
        self.min_iter_time = float("inf")
        self.max_iter_time = 0.0
        self._last_start: float | None = None
        self.evaluation_dict: dict[str, Any] = {}
        self.fid_history: list[tuple[int, float]] = []
        self.best_fid = float("inf")
        self._writer = None
        if tensorboard and self.save_dir is not None:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._writer = SummaryWriter(log_dir=str(self.save_dir / "tensorboard"))
            except ImportError:
                _log.warning("tensorboard unavailable; JSONL metrics only")

    # -- timing (reference :61-79) -------------------------------------------

    # -- profiling (§5.1: the reference had wall-clock only; full jax
    # profiler traces are one call away) --------------------------------

    def start_profile(self, n_steps_hint: int = 5):
        """Begin a jax.profiler trace into <save_dir>/profile."""
        import jax

        if self.save_dir is None:
            return
        jax.profiler.start_trace(str(self.save_dir / "profile"))
        self._profiling = True

    def stop_profile(self):
        import jax

        if getattr(self, "_profiling", False):
            jax.profiler.stop_trace()
            self._profiling = False

    def mark_start_iter(self):
        now = time.time()
        if self._last_start is not None:
            dt = now - self._last_start
            self.iter_times.append(dt)
            self.min_iter_time = min(self.min_iter_time, dt)
            self.max_iter_time = max(self.max_iter_time, dt)
        self._last_start = now

    def time_stats(self) -> dict[str, float]:
        if not self.iter_times:
            return {}
        return {
            "iter_time_mean": float(np.mean(self.iter_times)),
            "iter_time_min": self.min_iter_time,
            "iter_time_max": self.max_iter_time,
        }

    # -- FID (reference :322-347) ---------------------------------------------

    def register_fid(self, step: int, fid: float) -> bool:
        """Record an FID value; returns True when it is the best so far."""
        self.fid_history.append((step, fid))
        # tie-INCLUSIVE like the reference (fids[-1] == fids.min(),
        # tracker.py:343-347): a tied FID refreshes the best checkpoint at
        # the newer step; also keeps this consistent with is_best_fid()
        is_best = fid <= self.best_fid
        self.best_fid = min(self.best_fid, fid)
        self.evaluation_dict["fid"] = fid
        self.evaluation_dict["best_fid"] = self.best_fid
        return is_best

    def is_best_fid(self) -> bool:
        return bool(self.fid_history) and self.fid_history[-1][1] <= self.best_fid

    # -- separability ------------------------------------------------------------

    def register_separability(self, step: int, loss_name: str, layer_stats):
        """layer_stats: list of {'same','not_same','all_not_same'} arrays.
        Also emits TensorBoard histograms of each distance population
        (reference tracker.py:313-320)."""
        for li, st in enumerate(layer_stats):
            self.evaluation_dict[f"separability/{loss_name}/l{li}_same_mean"] = float(
                np.mean(st["same"])
            )
            self.evaluation_dict[f"separability/{loss_name}/l{li}_2ndbest_mean"] = float(
                np.mean(st["not_same"])
            )
            margin = float(np.mean(st["not_same"]) - np.mean(st["same"]))
            self.evaluation_dict[f"separability/{loss_name}/l{li}_margin"] = margin
            if self._writer is not None:
                for kind in ("same", "not_same", "all_not_same"):
                    self._writer.add_histogram(
                        f"separability/{loss_name}/l{li}_{kind}",
                        np.asarray(st[kind]),
                        step,
                    )

    def save_bucket_images(self, step: int, loss_name: str, images):
        """Worst same-pair "bucket" grid: the k pairs whose shared-group
        distance is LARGEST — the current failure cases (reference
        tracker.py:303-311). images: [2k, H, W, C] in [0,1], pairs adjacent."""
        if self.save_dir is None:
            return None
        from gan_control_tpu.evaluation.generation import save_image_grid

        out = self.save_dir / "buckets" / loss_name
        out.mkdir(parents=True, exist_ok=True)
        path = out / f"{step:06d}.jpg"
        save_image_grid(np.asarray(images), path, nrow=2)
        return path

    # -- sink (reference write_stats :349-353) -------------------------------------

    def write_stats(self, step: int, extra: dict[str, Any] | None = None):
        record = {"iter": step, **self.time_stats(), **self.evaluation_dict}
        if extra:
            record.update({k: float(v) for k, v in extra.items()})
        if self.save_dir is not None:
            with open(self.save_dir / "metrics.jsonl", "a") as f:
                f.write(json.dumps(record) + "\n")
            if self._csv:
                import csv

                path = self.save_dir / "monitor.csv"
                # the header is the UNION of keys ever seen: when a new key
                # appears (fid/separability steps) rewrite the file with the
                # merged header so every row stays aligned with it
                fields = sorted(set(self._csv_fields) | set(record))
                if fields != self._csv_fields and path.exists():
                    rows = list(csv.DictReader(open(path, newline="")))
                    with open(path, "w", newline="") as f:
                        w = csv.DictWriter(f, fieldnames=fields)
                        w.writeheader()
                        for r in rows:
                            w.writerow({k: r.get(k, "") for k in fields})
                self._csv_fields = fields
                new = not path.exists()
                with open(path, "a", newline="") as f:
                    w = csv.DictWriter(f, fieldnames=fields)
                    if new:
                        w.writeheader()
                    w.writerow({k: record.get(k, "") for k in fields})
        if self._writer is not None:
            for k, v in record.items():
                if isinstance(v, (int, float)) and k != "iter":
                    self._writer.add_scalar(k, v, step)
        _log.info("stats @%d: %s", step, json.dumps(record))
        self.evaluation_dict = {}
        return record
