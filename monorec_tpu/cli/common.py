"""Shared CLI plumbing: argparse, seeding, model/state construction."""

from __future__ import annotations

import argparse
from typing import Dict, Optional

import jax
import numpy as np

from monorec_tpu.config import ConfigParser
from monorec_tpu.train.state import create_train_state


def standard_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("-c", "--config", default=None, type=str, help="config file path")
    p.add_argument("-r", "--resume", default=None, type=str, help="checkpoint to resume")
    p.add_argument("-d", "--device", default=None, type=str, help="device selector (unused on TPU)")
    p.add_argument(
        "-o", "--options", default=[], nargs="+", help="free-form loss/trainer options"
    )
    return p


def train_overrides(p: argparse.ArgumentParser):
    p.add_argument("--lr", default=None, type=float)
    p.add_argument("--bs", default=None, type=int)
    return p


def parse_config(args, with_train_overrides: bool = False) -> ConfigParser:
    overrides: Dict[str, object] = {}
    if with_train_overrides:
        if getattr(args, "lr", None) is not None:
            overrides["optimizer.args.lr"] = args.lr
        if getattr(args, "bs", None) is not None:
            overrides["data_loader.args.batch_size"] = args.bs
    return ConfigParser(
        config_path=args.config,
        resume=args.resume,
        overrides=overrides,
        options=list(args.options) if getattr(args, "options", None) else [],
    )


def first_batch(data_loader) -> Dict:
    return next(iter(data_loader))


def seed_everything(seed: int = 0) -> jax.Array:
    np.random.seed(0)
    return jax.random.PRNGKey(seed)


def init_state_with_checkpoints(model, batch, rng, tx, ckpts: Dict):
    """Create a train state, then apply stage-curriculum checkpoint loading
    (full / mask-only / depth-only), mirroring monorec_model.py:630-657.

    Also resolves the ImageNet-encoder requirement: when no full checkpoint
    provides encoder weights, torchvision-format ResNet weights are injected
    from ``ckpts['imagenet_weights']`` / the env var / the hub cache, and a
    loud warning fires if the encoder would be frozen while random."""
    from monorec_tpu.models.pretrained import (
        inject_imagenet_encoder,
        warn_if_frozen_random_encoder,
    )
    from monorec_tpu.train.checkpoints import load_submodule_params

    state = create_train_state(model, batch, rng, tx)
    params = state.params
    batch_stats = state.batch_stats
    encoder_loaded = False
    if ckpts.get("checkpoint_location"):
        locs = ckpts["checkpoint_location"]
        params = load_submodule_params(
            params, locs if isinstance(locs, list) else [locs], None
        )
        encoder_loaded = True
    if ckpts.get("mask_cp_loc"):
        locs = ckpts["mask_cp_loc"]
        params = load_submodule_params(
            params, locs if isinstance(locs, list) else [locs], ["att"]
        )
    if ckpts.get("depth_cp_loc"):
        locs = ckpts["depth_cp_loc"]
        params = load_submodule_params(
            params, locs if isinstance(locs, list) else [locs], ["depth_net"]
        )
    if not encoder_loaded:
        params, batch_stats, encoder_loaded = inject_imagenet_encoder(
            params,
            batch_stats,
            ckpts.get("imagenet_weights"),
            getattr(model.config, "resnet_layers", 18),
        )
    warn_if_frozen_random_encoder(
        getattr(model.config, "freeze_resnet", True), encoder_loaded
    )
    return state.replace(params=params, batch_stats=batch_stats)
