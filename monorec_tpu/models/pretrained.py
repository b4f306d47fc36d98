"""ImageNet-pretrained ResNet encoder injection.

The reference freezes a *torchvision ImageNet-pretrained* ResNet encoder
(``model/monorec/monorec_model.py:98-111,616-619``); training with a frozen
*random* encoder silently breaks the curriculum's semantics. This module
closes that gap without requiring torchvision at runtime:

* ``convert_torchvision_resnet``: converts a raw torchvision ResNet
  ``state_dict`` (``conv1.weight``, ``layer1.0.conv1.weight``, ...) into the
  flax ``encoder`` subtree via the same mapping as the full-checkpoint
  converter (``monorec_tpu.convert``).
* ``inject_imagenet_encoder``: loads a ``.pth`` file (explicit path, the
  ``MONOREC_TPU_IMAGENET_RESNET`` env var, or the torch hub cache) and
  overwrites the encoder params/batch_stats in-place in a train state tree.
* ``warn_if_frozen_random_encoder``: loud guidance when a run would freeze
  a random encoder (no checkpoint and no ImageNet weights found) — set
  ``"freeze_resnet": false`` in the model args in that case.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path
from typing import Dict, Optional, Tuple

logger = logging.getLogger(__name__)

_HUB_DIRS = (
    Path.home() / ".cache" / "torch" / "hub" / "checkpoints",
    Path("saved/weights"),
)
_HUB_NAMES = {
    18: ("resnet18-5c106cde.pth", "resnet18-f37072fd.pth", "resnet18.pth"),
    34: ("resnet34-333f7ec4.pth", "resnet34-b627a593.pth", "resnet34.pth"),
}


def find_imagenet_weights(layers: int = 18) -> Optional[Path]:
    env = os.environ.get("MONOREC_TPU_IMAGENET_RESNET")
    if env:
        p = Path(env)
        if p.exists():
            return p
    for d in _HUB_DIRS:
        for name in _HUB_NAMES.get(layers, ()):
            p = d / name
            if p.exists():
                return p
    return None


def convert_torchvision_resnet(state_dict: Dict) -> Tuple[Dict, Dict]:
    """Torchvision ResNet state_dict -> (encoder params, encoder batch_stats).

    Accepts numpy or torch tensors; keys may be raw torchvision
    (``conv1.weight``) or already reference-prefixed
    (``_feature_extractor.encoder.conv1.weight``).
    """
    from monorec_tpu.convert import Converter

    sd = {}
    for k, v in state_dict.items():
        v = v.numpy() if hasattr(v, "numpy") else v
        if not k.startswith("_feature_extractor."):
            k = f"_feature_extractor.encoder.{k}"
        sd[k] = v
    c = Converter(sd)
    c.convert_resnet()
    return c.params.get("encoder", {}), c.batch_stats.get("encoder", {})


def inject_imagenet_encoder(
    params: Dict,
    batch_stats: Dict,
    path: Optional[str] = None,
    layers: int = 18,
) -> Tuple[Dict, Dict, bool]:
    """Overwrite the ``encoder`` subtrees from an ImageNet ResNet ``.pth``.

    Returns (params, batch_stats, injected). Never raises on a missing
    file — the caller decides how loud to be (see
    ``warn_if_frozen_random_encoder``).
    """
    p = Path(path) if path else find_imagenet_weights(layers)
    if p is None or not p.exists():
        return params, batch_stats, False
    import torch

    sd = torch.load(p, map_location="cpu", weights_only=True)
    enc_params, enc_stats = convert_torchvision_resnet(sd)
    if not enc_params:
        logger.warning(f"{p} contained no convertible ResNet weights")
        return params, batch_stats, False

    # The converted subtree must match the model's encoder structure
    # exactly — replacing it with a partial/mismatched conversion (e.g. a
    # resnet34 .pth under a resnet18 model) would raise an opaque
    # ScopeError at the first apply. Refuse instead.
    import jax

    def _keys(tree):
        return {
            jax.tree_util.keystr(kp)
            for kp, _ in jax.tree_util.tree_flatten_with_path(tree)[0]
        }

    want = _keys(params.get("encoder", {}))
    got = _keys(enc_params)
    if want != got:
        logger.warning(
            f"{p} converts to a different encoder structure than the model "
            f"(e.g. wrong resnet_layers): {len(got - want)} unexpected / "
            f"{len(want - got)} missing params; not injecting."
        )
        return params, batch_stats, False
    params = dict(params, encoder=enc_params)
    batch_stats = dict(batch_stats, encoder=enc_stats)
    logger.info(f"Injected ImageNet ResNet-{layers} encoder weights from {p}")
    return params, batch_stats, True


def warn_if_frozen_random_encoder(freeze_resnet: bool, encoder_loaded: bool):
    """Reference behavior needs a *pretrained* frozen encoder; freezing a
    random one trains against meaningless features. Shout about it."""
    if freeze_resnet and not encoder_loaded:
        msg = (
            "freeze_resnet=True but the ResNet encoder weights are RANDOM "
            "(no checkpoint and no ImageNet weights found). The reference "
            "freezes an ImageNet-pretrained encoder "
            "(monorec_model.py:98-111,616-619); training this way will not "
            "reproduce it. Either provide weights (MONOREC_TPU_IMAGENET_RESNET="
            "/path/to/resnet18.pth, or 'imagenet_weights' in the arch config) "
            "or set \"freeze_resnet\": false in the model args."
        )
        logger.warning(msg)
        import sys

        print(f"\n{'!' * 70}\nWARNING: {msg}\n{'!' * 70}\n", file=sys.stderr)
