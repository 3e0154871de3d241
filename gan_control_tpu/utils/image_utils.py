"""PIL image helpers (reference utils/pil_images_utils.py): grids with text
overlay, annotated attribute matrices (pose arrows, age/hair text), gif
writing — all host-side numpy/PIL."""

from __future__ import annotations

import math
from pathlib import Path
from typing import Sequence

import numpy as np

from gan_control_tpu.evaluation.generation import to_uint8_grid


def write_text_on_image(img_u8: np.ndarray, text: str, xy=(4, 4)) -> np.ndarray:
    from PIL import Image, ImageDraw

    im = Image.fromarray(img_u8)
    ImageDraw.Draw(im).text(xy, text, fill=(255, 255, 0))
    return np.asarray(im)


def annotate_images(images: np.ndarray, texts: Sequence[str]) -> np.ndarray:
    """[N,H,W,C] in [0,1] + per-image text -> annotated [0,1] array."""
    out = []
    for img, t in zip(np.asarray(images), texts):
        u8 = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        out.append(write_text_on_image(u8, t).astype(np.float32) / 255.0)
    return np.stack(out)


def draw_axis_on_image(img_u8: np.ndarray, yaw: float, pitch: float, roll: float,
                       size: float = 30.0) -> np.ndarray:
    """Head-pose axes overlay (reference utils/hopenet_utils.draw_axis):
    X red, Y green, Z blue arrows from the image center, angles in degrees."""
    from PIL import Image, ImageDraw

    im = Image.fromarray(img_u8)
    d = ImageDraw.Draw(im)
    h, w = img_u8.shape[:2]
    cx, cy = w / 2, h / 2
    p, y, r = (math.radians(a) for a in (pitch, -yaw, roll))
    # projected axis endpoints (standard hopenet visualization math)
    x1 = size * (math.cos(y) * math.cos(r)) + cx
    y1 = size * (math.cos(p) * math.sin(r) + math.cos(r) * math.sin(p) * math.sin(y)) + cy
    x2 = size * (-math.cos(y) * math.sin(r)) + cx
    y2 = size * (math.cos(p) * math.cos(r) - math.sin(p) * math.sin(y) * math.sin(r)) + cy
    x3 = size * math.sin(y) + cx
    y3 = size * (-math.cos(y) * math.sin(p)) + cy
    # reference colors (hopenet_utils.draw_axis:138-140, PIL RGB): the X
    # axis line is BLUE, Y green, Z red — matching for side-by-side parity
    d.line([(cx, cy), (x1, y1)], fill=(0, 0, 255), width=2)
    d.line([(cx, cy), (x2, y2)], fill=(0, 255, 0), width=2)
    d.line([(cx, cy), (x3, y3)], fill=(255, 0, 0), width=2)
    return np.asarray(im)


def save_gif_from_grids(frames: Sequence[np.ndarray], path: str | Path,
                        nrow: int = 4, duration_ms: int = 500):
    from PIL import Image

    imgs = [Image.fromarray(to_uint8_grid(np.asarray(f), nrow=nrow)) for f in frames]
    imgs[0].save(str(path), save_all=True, append_images=imgs[1:],
                 duration=duration_ms, loop=0)


def get_kmin(values: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Indices + values of the k smallest entries (reference
    utils/pandas_utils.get_kmin)."""
    values = np.asarray(values).ravel()
    idx = np.argpartition(values, min(k, len(values) - 1))[:k]
    idx = idx[np.argsort(values[idx])]
    return idx, values[idx]
