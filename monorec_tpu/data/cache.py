"""Memory-mapped sample cache: the >50 kf/s data-pipeline path.

The PIL-decode + resize + pose/LiDAR assembly of the raw datasets costs
tens of ms per sample on a host core — far short of the TPU's consumption
rate (SURVEY §7 hard part 6). ``build_cache`` runs any dataset once and
stores every sample key as a row of a flat memory-mapped ``.npy`` per key;
``CachedDataset`` then serves samples with nothing but memcpy + a cheap
uint8→float conversion, and re-applies the per-sample color jitter on the
fly so augmentation stays stochastic across epochs (caching *after* jitter
would freeze it).

Image keys are stored as uint8 (the sources are 8-bit PNGs; the only loss
is the sub-LSB rounding of the bilinear resize). Everything else is kept
at its original dtype.

Usage:
    python tools/build_cache.py -c configs/train/monorec/monorec_depth.json \
        --out saved/cache/kitti_train
    # then in the config: {"type": "CachedDataloader",
    #                      "args": {"cache_dir": ..., "batch_size": ...}}
"""

from __future__ import annotations

import json
import threading
from pathlib import Path
from typing import Dict, Optional, Sequence

import numpy as np

from monorec_tpu.data.color_jitter import apply_color_jitter, sample_color_jitter

IMAGE_KEYS = ("keyframe", "frames", "stereoframe")


def build_cache(
    dataset,
    out_dir: str,
    image_keys: Sequence[str] = IMAGE_KEYS,
    log_every: int = 200,
) -> Path:
    """Materialize ``dataset`` into ``out_dir`` (one memmap per sample key).

    The dataset should be constructed WITHOUT color augmentation — the
    cache stores clean images and ``CachedDataset`` re-jitters.
    """
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    n = len(dataset)
    first = dataset[0]

    mms: Dict[str, np.memmap] = {}
    meta = {"n": n, "keys": {}, "image_keys": list(image_keys)}
    for k, v in first.items():
        v = np.asarray(v)
        if k in image_keys:
            dtype, store = "uint8", True
        else:
            dtype, store = str(v.dtype), True
        if store:
            mms[k] = np.lib.format.open_memmap(
                out / f"{k}.npy", mode="w+", dtype=dtype, shape=(n,) + v.shape
            )
            meta["keys"][k] = {"shape": list(v.shape), "dtype": dtype}

    for i in range(n):
        s = dataset[i] if i else first
        for k, mm in mms.items():
            v = np.asarray(s[k])
            if k in image_keys:
                v = np.clip(np.round((v + 0.5) * 255.0), 0, 255).astype(np.uint8)
            mm[i] = v
        if log_every and i % log_every == 0:
            print(f"cache: {i}/{n}")
    for mm in mms.values():
        mm.flush()
    (out / "meta.json").write_text(json.dumps(meta))
    return out


class CachedDataset:
    """Serves samples from a ``build_cache`` directory at memcpy speed."""

    def __init__(
        self,
        cache_dir: str,
        color_augmentation: bool = False,
        seed: int = 0,
        custom_length: Optional[int] = None,
    ):
        self.cache_dir = Path(cache_dir)
        meta = json.loads((self.cache_dir / "meta.json").read_text())
        self.n = meta["n"] if custom_length is None else min(custom_length, meta["n"])
        self.image_keys = set(meta["image_keys"]) & set(meta["keys"])
        self._mms = {
            k: np.load(self.cache_dir / f"{k}.npy", mmap_mode="r")
            for k in meta["keys"]
        }
        self.use_color_augmentation = color_augmentation
        self._rng = np.random.default_rng(seed)
        # DataLoader calls __getitem__ from a thread pool and
        # np.random.Generator is not thread-safe — serialize draws.
        self._rng_lock = threading.Lock()

    def __len__(self) -> int:
        return self.n

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        if self.use_color_augmentation:
            with self._rng_lock:
                jitter = sample_color_jitter(self._rng)
        else:
            jitter = None
        out: Dict[str, np.ndarray] = {}
        for k, mm in self._mms.items():
            v = np.array(mm[i])  # materialize the row (memcpy)
            if k in self.image_keys:
                v = v.astype(np.float32) / 255.0
                if jitter is not None:
                    if v.ndim == 4:  # (F, H, W, C)
                        v = np.stack([apply_color_jitter(f, jitter) for f in v])
                    else:
                        v = apply_color_jitter(v, jitter)
                v = v - 0.5
            out[k] = v
        return out
