"""Orbax checkpointing: save/resume + partial (sub-module) loading.

TPU analog of the reference checkpoint flow (``base/base_trainer.py:134-191``
and the partial loading in ``monorec_model.py:630-657``): a checkpoint is a
pytree {params, batch_stats, opt_state, epoch, monitor_best}; the stage
curriculum loads only the ``depth_net`` / ``att`` / ``encoder`` subtrees from
earlier-stage checkpoints.
"""

from __future__ import annotations

import shutil
from pathlib import Path
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    ckpt_dir: Path,
    name: str,
    state,
    epoch: int,
    monitor_best: float,
    keep_link: Optional[str] = None,
    optimizer_type: Optional[str] = None,
) -> Path:
    """Save a checkpoint under ``ckpt_dir/name``; optionally copy to a link
    name (e.g. 'model_best')."""
    ckpt_dir = Path(ckpt_dir).resolve()
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    path = ckpt_dir / name
    if path.exists():
        shutil.rmtree(path)
    meta = {"epoch": epoch, "monitor_best": float(monitor_best)}
    if optimizer_type is not None:
        # Resume restores opt_state only when the optimizer type matches
        # (reference base/base_trainer.py:180-188).
        meta["optimizer_type"] = optimizer_type
    payload = {
        "params": _to_host(state.params),
        "batch_stats": _to_host(state.batch_stats),
        "opt_state": _to_host(state.opt_state),
        "meta": meta,
    }
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, payload)
    if keep_link:
        link = ckpt_dir / keep_link
        if link.exists():
            shutil.rmtree(link)
        shutil.copytree(path, link)
    return path


def load_checkpoint(path: Path) -> Dict[str, Any]:
    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(Path(path).resolve())


def restore_state(state, payload: Dict[str, Any], restore_optimizer: bool = True):
    """Rebuild a TrainState from a checkpoint payload (strict shapes)."""
    new = state.replace(
        params=payload["params"], batch_stats=payload.get("batch_stats", {})
    )
    if restore_optimizer and "opt_state" in payload:
        new = new.replace(
            opt_state=jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(state.opt_state),
                jax.tree_util.tree_leaves(payload["opt_state"]),
            )
        )
    return new


def load_submodule_params(
    params: Dict, checkpoint_paths: Sequence[str], submodules: Optional[Sequence[str]] = None
) -> Dict:
    """Overwrite ``params`` subtrees from earlier-stage checkpoints.

    ``submodules=None`` loads every top-level module present in both;
    otherwise only the named ones (e.g. ['att'], ['depth_net']). Mirrors the
    reference's checkpoint_location / mask_cp_loc / depth_cp_loc behavior.
    """
    params = dict(params)
    for cp in checkpoint_paths:
        payload = load_checkpoint(Path(cp))
        source = payload["params"]
        keys = submodules if submodules is not None else source.keys()
        for key in keys:
            if key in source and key in params:
                params[key] = source[key]
    return params
