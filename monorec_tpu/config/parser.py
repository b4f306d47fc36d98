"""JSON config system, compatible with the reference config format.

Reads the same JSON files as the reference (``configs/train/monorec/*.json``
etc.), including:

* reflection blocks ``{"type": ClassName, "args": {...}}`` for arch,
  data_loader, optimizer, lr_scheduler, loss and metrics
  (reference ``utils/parse_config.py:72-89``);
* CLI key-path overrides (``--lr`` -> optimizer.args.lr);
* run-dir layout ``<save_dir>/models/<name>/<timestamp>`` +
  ``<save_dir>/log/<name>/<timestamp>`` with ``timestamp_replacement`` for
  deterministic paths, and a config snapshot written into the run dir;
* resume: re-read the saved run config.

Reference class names map onto this framework's components: a
``KittiOdometryDataloader`` block builds a ``KittiOdometryDataset`` + our
``DataLoader``; ``MonoRecModel`` args build a ``MonoRecConfig``. Torch-only
knobs that have no JAX equivalent (``num_workers`` pinning etc.) are accepted
and ignored where harmless.
"""

from __future__ import annotations

import json
from datetime import datetime
from functools import reduce
from operator import getitem
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

from monorec_tpu.models.monorec import MonoRecConfig

# args accepted by the reference MonoRecModel that map 1:1 to MonoRecConfig
_MODEL_CONFIG_KEYS = {
    "inv_depth_min_max", "cv_depth_steps", "pretrain_mode", "pretrain_dropout",
    "pretrain_dropout_mode", "augmentation", "use_mono", "use_stereo",
    "use_ssim", "sfcv_mult_mask", "simple_mask", "mask_use_cv",
    "mask_use_feats", "cv_patch_size", "depth_large_model", "no_cv",
    "freeze_resnet", "freeze_module", "resnet_layers", "cv_warp_dtype",
    "compute_dtype",
}

_LOADER_KEYS = {
    "batch_size", "shuffle", "validation_split", "num_workers", "drop_last",
    "start", "end", "every_nth",
}

# reference dataloader class name -> dataset class name
_DATALOADER_TO_DATASET = {
    "KittiOdometryDataloader": "KittiOdometryDataset",
    "OxfordRobotCarDataloader": "OxfordRobotCarDataset",
    "TUMMonoVODataloader": "TUMMonoVODataset",
    "TUMRGBDDataloader": "TUMRGBDDataset",
    "SyntheticSweepDataloader": "SyntheticSweepDataset",
    "CachedDataloader": "CachedDataset",
}


def build_model_config(arch_args: Dict) -> Tuple[MonoRecConfig, Dict]:
    """Split a reference MonoRecModel args dict into (MonoRecConfig,
    checkpoint-loading spec). Model dtype knobs not set explicitly are
    filled from the active precision policy (``monorec_tpu.precision``)."""
    from monorec_tpu.precision import apply_to_model_kwargs

    cfg_kwargs = {}
    for k, v in arch_args.items():
        if k in _MODEL_CONFIG_KEYS:
            if k in ("inv_depth_min_max", "freeze_module"):
                v = tuple(v)
            if k == "pretrain_mode":
                v = int(v)
            if k == "use_ssim":
                v = int(v)
            cfg_kwargs[k] = v
    cfg_kwargs = apply_to_model_kwargs(cfg_kwargs)
    ckpts = {
        "checkpoint_location": arch_args.get("checkpoint_location"),
        "mask_cp_loc": arch_args.get("mask_cp_loc"),
        "depth_cp_loc": arch_args.get("depth_cp_loc"),
        "imagenet_weights": arch_args.get("imagenet_weights"),
    }
    return MonoRecConfig(**cfg_kwargs), ckpts


def build_dataset(type_name: str, args: Dict):
    from monorec_tpu import data as data_mod

    dataset_name = _DATALOADER_TO_DATASET.get(type_name, type_name)
    if dataset_name not in data_mod.DATASETS:
        data_mod._register_extra()
    ds_args = {k: v for k, v in args.items() if k not in _LOADER_KEYS}
    return data_mod.DATASETS[dataset_name](**ds_args)


def build_dataloader(block: Dict, device_put: bool = True):
    from monorec_tpu.data import DataLoader
    from monorec_tpu.data.loader import DatasetWrapper

    args = dict(block["args"])
    dataset = build_dataset(block["type"], args)
    # Optional start/end/every_nth view (the reference's DS_Wrapper,
    # utils/util.py:148) — lets a config evaluate a slice, e.g. the only
    # fully-populated keyframe of the committed seq-07 fixture.
    if any(k in args for k in ("start", "end", "every_nth")):
        dataset = DatasetWrapper(
            dataset,
            start=args.get("start", 0),
            end=args.get("end", -1),
            every_nth=args.get("every_nth", 1),
        )
    return DataLoader(
        dataset,
        batch_size=args.get("batch_size", 1),
        shuffle=args.get("shuffle", True),
        validation_split=args.get("validation_split", 0.0),
        num_workers=args.get("num_workers", 4),
        drop_last=args.get("drop_last", True),
        device_put=device_put,
    )


class ConfigParser:
    def __init__(
        self,
        config_path: Optional[str] = None,
        resume: Optional[str] = None,
        overrides: Optional[Dict[str, Any]] = None,
        options: Sequence[str] = (),
        timestamp: bool = True,
    ):
        if resume is not None:
            self.resume = Path(resume)
            cfg_file = self.resume.parent / "config.json"
            with open(cfg_file) as f:
                config = json.load(f)
            if config_path is not None:
                with open(config_path) as f:
                    config.update(json.load(f))
        else:
            if config_path is None:
                raise ValueError("a config file is required (pass -c config.json)")
            self.resume = None
            with open(config_path) as f:
                config = json.load(f)

        for keypath, value in (overrides or {}).items():
            if value is not None:
                _set_by_path(config, keypath.split("."), value)

        self._config = config
        self.options = list(options)

        # One config-level precision knob selects exact-parity vs serving
        # mixed precision end-to-end (model dtypes + loss warp dtype).
        from monorec_tpu.precision import set_precision

        set_precision(config.get("precision", "exact"))

        ts = datetime.now().strftime(r"%m%d_%H%M%S") if timestamp else ""
        section = None
        for sec in ("trainer", "evaluater"):
            if sec in config:
                section = config[sec]
                break
        save_dir = Path((section or {}).get("save_dir", config.get("save_dir", "saved/")))
        if section and "timestamp_replacement" in section:
            ts = section["timestamp_replacement"]
        elif "timestamp_replacement" in config:
            ts = config["timestamp_replacement"]

        name = config.get("name", "run")
        self.save_dir = save_dir / "models" / name / ts
        self.log_dir = save_dir / "log" / name / ts
        self.save_dir.mkdir(parents=True, exist_ok=True)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        with open(self.save_dir / "config.json", "w") as f:
            json.dump(config, f, indent=4)

    def __getitem__(self, key):
        return self._config[key]

    def __contains__(self, key):
        return key in self._config

    def get(self, key, default=None):
        return self._config.get(key, default)

    @property
    def config(self) -> Dict:
        return self._config

    # ----- component builders -------------------------------------------

    def build_model(self):
        from monorec_tpu.models import MonoRec

        arch = self._config["arch"]
        cfg, ckpts = build_model_config(arch.get("args", {}))
        return MonoRec(cfg), ckpts

    def build_models(self) -> List:
        """For evaluate configs with a "models" list."""
        from monorec_tpu.models import MonoRec

        out = []
        for block in self._config.get("models", []):
            cfg, ckpts = build_model_config(block.get("args", {}))
            out.append((MonoRec(cfg), ckpts))
        return out

    def build_data_loader(self, key: str = "data_loader", device_put: bool = True):
        return build_dataloader(self._config[key], device_put=device_put)

    def build_loss(self):
        from monorec_tpu.losses import LOSSES

        return LOSSES[self._config["loss"]]

    def build_metrics(self):
        from monorec_tpu.metrics import get_metric

        return [get_metric(name) for name in self._config.get("metrics", [])]

    def build_optimizer(self, steps_per_epoch: int):
        from monorec_tpu.train.state import make_optimizer

        return make_optimizer(
            self._config.get("optimizer"),
            self._config.get("lr_scheduler"),
            steps_per_epoch,
        )


def _set_by_path(tree: Dict, keys: Sequence[str], value):
    reduce(getitem, keys[:-1], tree)[keys[-1]] = value
