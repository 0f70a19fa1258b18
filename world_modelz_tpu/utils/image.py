"""Image grid / PNG / GIF writers (PIL-based).

Replaces the reference's torchvision `make_grid` / `save_image` usage
(train_vqae.py:153-167) and the ImageMagick `make_gif.sh` assembly
(vq-video-diffusion/make_gif.sh:3) with dependency-light numpy + PIL.
Images are NHWC float in [0, 1] (grayscale NHW1 or RGB NHW3).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


def _to_uint8(img: np.ndarray) -> np.ndarray:
    img = np.nan_to_num(np.asarray(img, np.float32))
    img = np.clip(img, 0.0, 1.0)
    return (img * 255.0 + 0.5).astype(np.uint8)


def make_grid(
    images: np.ndarray,
    nrow: int = 8,
    pad: int = 2,
    pad_value: float = 0.2,
) -> np.ndarray:
    """Tile (N, H, W, C) images into a (GH, GW, C) grid (torchvision-style)."""
    images = np.asarray(images)
    if images.ndim == 3:
        images = images[..., None]
    n, h, w, c = images.shape
    ncol = min(nrow, n)
    nrows = -(-n // ncol)
    grid = np.full(
        (nrows * (h + pad) + pad, ncol * (w + pad) + pad, c),
        pad_value,
        np.float32,
    )
    for i in range(n):
        r, col = divmod(i, ncol)
        y = pad + r * (h + pad)
        x = pad + col * (w + pad)
        grid[y : y + h, x : x + w] = images[i]
    return grid


def save_image(img: np.ndarray, path: str) -> None:
    """Save (H, W, C) or (N, H, W, C) float [0,1] image(s) as PNG (batches
    are gridded first)."""
    from PIL import Image

    img = np.asarray(img)
    if img.ndim == 4:
        img = make_grid(img)
    arr = _to_uint8(img)
    if arr.shape[-1] == 1:
        arr = arr[..., 0]
    Image.fromarray(arr).save(path)


def save_gif(
    frames: Sequence[np.ndarray],
    path: str,
    fps: float = 8.0,
    loop: int = 0,
) -> None:
    """Assemble (H, W, C) float frames into an animated GIF
    (make_gif.sh equivalent)."""
    from PIL import Image

    imgs = []
    for f in frames:
        arr = _to_uint8(np.asarray(f))
        if arr.shape[-1] == 1:
            arr = arr[..., 0]
        imgs.append(Image.fromarray(arr).convert("P"))
    imgs[0].save(
        path,
        save_all=True,
        append_images=imgs[1:],
        duration=int(1000 / fps),
        loop=loop,
    )
