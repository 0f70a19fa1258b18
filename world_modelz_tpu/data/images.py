"""Frame-image dataset: recursive file scan with manifest caching + robust
decode.

Parity with `load_file_list` / `FileListImageDataset`
(minecraft/train_vqae.py:105-150): glob a directory tree, filter by regex,
cache the manifest (JSON here instead of a torch pickle), decode images to
float32 [0,1], drop undecodable files (the reference's None-filtering
collate, train_vqae.py:280-283).
"""

from __future__ import annotations

import glob
import json
import os
import re
from typing import Callable, List, Optional, Sequence

import numpy as np


def load_file_list(
    manifest_path: str, directory_glob: str, pattern: str = r".*\.png$"
) -> List[str]:
    """Scan `directory_glob` (recursive) for files matching `pattern`,
    caching the result at `manifest_path` (train_vqae.py:105-130)."""
    if os.path.isfile(manifest_path):
        with open(manifest_path) as f:
            cached = json.load(f)
        if cached:
            return cached

    rx = re.compile(pattern, flags=re.IGNORECASE)
    files = [
        os.path.abspath(fn)
        for fn in glob.iglob(directory_glob, recursive=True)
        if os.path.isfile(fn) and rx.match(fn)
    ]
    if not files:
        raise RuntimeError(
            f"No files matching {pattern!r} under {directory_glob!r}"
        )
    os.makedirs(os.path.dirname(manifest_path) or ".", exist_ok=True)
    with open(manifest_path, "w") as f:
        json.dump(files, f)
    return files


def _decode_image(path: str) -> Optional[np.ndarray]:
    """(H, W, 3) float32 in [0,1], or None on failure
    (train_vqae.py:142-150)."""
    try:
        from PIL import Image

        with Image.open(path) as img:
            arr = np.asarray(img.convert("RGB"), np.float32) / 255.0
        return arr
    except Exception:
        return None


class FileListImageDataset:
    """Batched iterator over an image file list with shuffling and
    decode-failure dropping."""

    def __init__(
        self,
        file_names: Sequence[str],
        batch_size: int,
        seed: int = 0,
        shuffle: bool = True,
        transform: Optional[Callable[[np.ndarray], np.ndarray]] = None,
    ):
        self.file_names = list(file_names)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.transform = transform
        self._rng = np.random.default_rng(seed)
        self._order = np.arange(len(self.file_names))
        self._cursor = len(self.file_names)  # trigger reshuffle
        self.epoch = 0

    def __len__(self) -> int:
        return len(self.file_names)

    def __getitem__(self, i: int) -> np.ndarray:
        """Random-access decode (the Grain-pipeline protocol). An
        undecodable file falls through to the next index — deterministic
        and static-shaped, the random-access analog of next_batch's
        draw-a-replacement policy."""
        n = len(self.file_names)
        for k in range(n):
            img = _decode_image(self.file_names[(i + k) % n])
            if img is not None:
                return (
                    self.transform(img)
                    if self.transform is not None
                    else img
                )
        raise RuntimeError("no decodable images in the file list")

    def _next_index(self) -> int:
        if self._cursor >= len(self._order):
            if self.shuffle:
                self._rng.shuffle(self._order)
            self._cursor = 0
            self.epoch += 1
        idx = int(self._order[self._cursor])
        self._cursor += 1
        return idx

    def next_batch(self) -> np.ndarray:
        """(B, H, W, 3) float32; undecodable files are skipped (the
        reference's remove-none collate keeps batches smaller, we instead
        keep batch shape static — a TPU requirement — by drawing
        replacements)."""
        out: List[np.ndarray] = []
        while len(out) < self.batch_size:
            img = _decode_image(self.file_names[self._next_index()])
            if img is None:
                continue
            if self.transform is not None:
                img = self.transform(img)
            out.append(img)
        return np.stack(out)
