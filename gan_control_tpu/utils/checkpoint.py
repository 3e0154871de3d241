"""Checkpoint / resume subsystem.

Directory contract follows the reference (SURVEY.md §5.4) so tooling carries
over unchanged:
  - ``<save_dir>/checkpoint/%06d.ckpt`` every save interval
    (reference generator_trainer.py:852-865 saves {g, d, g_ema, g_optim,
    d_optim}; here the whole GANTrainState pytree is one file),
  - ``best_fid.ckpt`` when FID improves (:728-731) — sorts after digits so
    the lexicographically-last file wins on restore, exactly like the
    reference's retrieve_model (inference/inference.py:114-118),
  - step is parsed from the filename on resume (:175-193).

Serialization is flax msgpack (host-side numpy); saves are atomic via
rename. Works for billions of parameters in streaming chunks is NOT needed
at this model scale (~30M params)."""

from __future__ import annotations

import os
import re
from pathlib import Path
from typing import Any

import flax.serialization
import jax


def save_checkpoint(ckpt_dir: str | Path, state: Any, step: int, name: str | None = None) -> Path:
    """Serialize a pytree to ``ckpt_dir/%06d.ckpt`` (or ``<name>.ckpt``)."""
    ckpt_dir = Path(ckpt_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    fname = f"{name}.ckpt" if name else f"{step:06d}.ckpt"
    path = ckpt_dir / fname
    tmp = ckpt_dir / (fname + ".tmp")
    host_state = jax.device_get(state)
    blob = flax.serialization.msgpack_serialize(
        flax.serialization.to_state_dict(host_state)
    )
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    return path


_SAVE_POOL = None  # lazily-built single worker: saves stay ordered


def save_checkpoint_async(ckpt_dir: str | Path, state: Any, step: int,
                          name: str | None = None):
    """Like ``save_checkpoint`` but overlapped with training: the
    device->host fetch happens HERE, on the caller's thread (it must —
    the trainer donates its state buffers into the next step, so the copy
    has to complete before the next dispatch), while msgpack serialization
    and the atomic write run on a single background worker so the chip
    keeps training through the multi-hundred-MB encode. Returns a Future
    of the written Path; call ``wait_pending_saves()`` before process
    exit (the trainer does on normal end and preemption)."""
    import concurrent.futures

    global _SAVE_POOL
    if _SAVE_POOL is None:
        _SAVE_POOL = concurrent.futures.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="ckpt-save"
        )
    host_state = jax.device_get(state)

    def _write() -> Path:
        return save_checkpoint(ckpt_dir, host_state, step, name=name)

    fut = _SAVE_POOL.submit(_write)
    _PENDING.append(fut)
    return fut


_PENDING: list = []


def wait_pending_saves() -> None:
    """Drain the async save queue and RE-RAISE the first failure (a
    synchronous torch.save would have halted training; silently finishing
    a run whose periodic checkpoints all failed is worse)."""
    global _SAVE_POOL
    if _SAVE_POOL is not None:
        _SAVE_POOL.shutdown(wait=True)
        _SAVE_POOL = None
    pending, _PENDING[:] = list(_PENDING), []
    for fut in pending:
        exc = fut.exception()
        if exc is not None:
            raise exc


def latest_checkpoint(ckpt_dir: str | Path) -> Path | None:
    """Lexicographically-last ``*.ckpt`` (zero-padded steps; ``best_fid``
    sorts after digits and wins when present — reference contract)."""
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.is_dir():
        return None
    files = sorted(p for p in ckpt_dir.iterdir() if p.suffix == ".ckpt")
    return files[-1] if files else None


def parse_step(path: str | Path, default: int = 0) -> int:
    """Training step encoded in a checkpoint filename; ``default`` for
    non-numeric names (best_fid.ckpt) — the reference keeps the configured
    start_iter in that case (try/except ValueError,
    generator_trainer.py:180-185), so callers should pass it."""
    m = re.match(r"(\d+)", Path(path).stem)
    return int(m.group(1)) if m else default


def load_state_dict(path: str | Path) -> dict:
    """Raw (structure-free) nested dict of numpy arrays — lets callers pick
    single entries (e.g. only ``g_ema``) without the full state template."""
    with open(path, "rb") as f:
        return flax.serialization.msgpack_restore(f.read())


def restore_checkpoint(path: str | Path, target: Any) -> Any:
    """Restore into the structure of ``target`` (a template pytree)."""
    return flax.serialization.from_state_dict(target, load_state_dict(path))


def restore_into(target: Any, state_dict: dict) -> Any:
    """from_state_dict wrapper for partial restores."""
    return flax.serialization.from_state_dict(target, state_dict)
