"""Materialize a dataset into a memory-mapped cache for >50 kf/s loading.

    python tools/build_cache.py -c configs/train/monorec/monorec_depth.json \
        --out saved/cache/kitti_train
    python tools/build_cache.py --dataset KittiOdometryDataset \
        --args '{"dataset_dir": "...", "sequences": ["07"]}' --out saved/cache/s07

The dataset is built with color augmentation disabled (the cache stores
clean images; ``CachedDataset`` re-jitters per epoch).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-c", "--config", help="config whose data_loader block to cache")
    p.add_argument("--dataset", help="dataset class name (alternative to -c)")
    p.add_argument("--args", default="{}", help="JSON kwargs for --dataset")
    p.add_argument("--out", required=True, help="output cache directory")
    a = p.parse_args(argv)

    from monorec_tpu.config.parser import build_dataset
    from monorec_tpu.data import build_cache

    if a.config:
        with open(a.config) as f:
            cfg = json.load(f)
        block = cfg["data_loader"]
        base_args = dict(block["args"])
        for k in ("use_color_augmentation", "color_augmentation"):
            base_args.pop(k, None)
        # Datasets name the flag differently (KITTI:
        # use_color_augmentation, TUM: color_augmentation); try both so
        # the cache is guaranteed to store CLEAN images.
        dataset = None
        for flag in ("use_color_augmentation", "color_augmentation"):
            try:
                dataset = build_dataset(block["type"], {**base_args, flag: False})
                break
            except TypeError:
                continue
        if dataset is None:
            dataset = build_dataset(block["type"], base_args)
        for attr in ("use_color_augmentation", "color_augmentation"):
            if getattr(dataset, attr, False):
                raise SystemExit(
                    f"refusing to build a cache from a dataset with {attr}="
                    "True: the cache must store clean images "
                    "(CachedDataset re-jitters per epoch)"
                )
    else:
        dataset = build_dataset(a.dataset, json.loads(a.args))

    out = build_cache(dataset, a.out)
    print(f"cached {len(dataset)} samples -> {out}")


if __name__ == "__main__":
    main()
