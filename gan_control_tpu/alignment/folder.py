"""Pre-computed-detection 'detector' (reference face-alignment
detection/folder/folder_detector.py): faces were already detected (or are
ground truth) and the boxes live next to each image as `<name>.npy`
(list/array of (x1, y1, x2, y2[, score]) rows). Mirrors the SFDDetector /
BlazeFaceDetector `detect()` surface so the alignment pipeline can swap
it in; the torch `.t7`/`.pth` sidecar formats are accepted when torch is
importable."""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np


class FolderDetector:
    """detect_from_path(image_path) -> [N,>=4] (x1,y1,x2,y2[,score]);
    detect(images, paths=...) -> one array per image (API parity with
    SFDDetector.detect, which is batch-of-images keyed)."""

    reference_scale = 195
    reference_x_shift = 0
    reference_y_shift = 0

    def detect_from_path(self, image_path: str | Path) -> np.ndarray:
        base = os.path.splitext(str(image_path))[0]
        if os.path.isfile(base + ".npy"):
            faces = np.load(base + ".npy", allow_pickle=True)
        elif os.path.isfile(base + ".t7") or os.path.isfile(base + ".pth"):
            import torch

            ext = ".t7" if os.path.isfile(base + ".t7") else ".pth"
            faces = torch.load(base + ext, map_location="cpu",
                               weights_only=False)
        else:
            raise FileNotFoundError(
                f"no detection sidecar ({base}.npy/.t7/.pth) for {image_path}"
            )
        faces = np.asarray([np.asarray(f, np.float32).ravel() for f in faces])
        if faces.size == 0:
            # a faceless image's sidecar is legitimate: zero rows ravel to
            # shape (0,) — normalize to an empty (0, 5) detection array
            return np.zeros((0, 5), np.float32)
        if faces.ndim != 2 or faces.shape[1] < 4:
            raise TypeError(
                f"sidecar for {image_path} must hold (x1,y1,x2,y2[,score]) "
                f"rows, got shape {faces.shape}"
            )
        return faces

    def detect(self, images, paths) -> list[np.ndarray]:
        if len(paths) != len(images):
            raise ValueError("one sidecar path per image required")
        return [self.detect_from_path(p) for p in paths]
