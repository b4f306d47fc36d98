"""ImageNet-encoder weight injection (VERDICT r1 "Next" #4).

The reference freezes a torchvision ImageNet-pretrained ResNet
(monorec_model.py:98-111,616-619). These tests pin the injection path: a
torchvision-format ResNet ``.pth`` flows into the flax ``encoder`` subtree
through ``init_state_with_checkpoints``, and a frozen-random encoder is
announced loudly.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import torch

sys.path.insert(0, str(Path(__file__).resolve().parent))

from torch_reference import MonoRecTorch  # noqa: E402

from monorec_tpu.cli.common import init_state_with_checkpoints  # noqa: E402
from monorec_tpu.models import MonoRec, MonoRecConfig  # noqa: E402
from monorec_tpu.models.pretrained import (  # noqa: E402
    convert_torchvision_resnet,
    inject_imagenet_encoder,
    warn_if_frozen_random_encoder,
)

B, H, W, F, D = 1, 32, 64, 2, 4


def _batch():
    rng = np.random.default_rng(0)
    eye = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    return {
        "keyframe": jnp.asarray(
            rng.uniform(-0.5, 0.5, (B, H, W, 3)).astype(np.float32)
        ),
        "keyframe_pose": jnp.asarray(eye),
        "keyframe_intrinsics": jnp.asarray(eye),
        "frames": jnp.asarray(
            rng.uniform(-0.5, 0.5, (B, F, H, W, 3)).astype(np.float32)
        ),
        "poses": jnp.asarray(np.tile(eye[:, None], (1, F, 1, 1))),
        "intrinsics": jnp.asarray(np.tile(eye[:, None], (1, F, 1, 1))),
        "target": jnp.asarray(
            rng.uniform(0.01, 0.3, (B, H, W, 1)).astype(np.float32)
        ),
    }


@pytest.fixture(scope="module")
def resnet_pth(tmp_path_factory):
    """A torchvision-format ResNet-18 state_dict on disk (the oracle's
    encoder uses torchvision attribute names, so its keys match)."""
    torch.manual_seed(7)
    tmodel = MonoRecTorch(depth_steps=D)
    enc = tmodel._feature_extractor.encoder
    for m in enc.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.05)
            m.running_var.uniform_(0.5, 1.5)
    path = tmp_path_factory.mktemp("weights") / "resnet18.pth"
    torch.save(enc.state_dict(), path)
    return path


def test_convert_torchvision_resnet_covers_flax_tree(resnet_pth):
    sd = torch.load(resnet_pth, weights_only=True)
    enc_params, enc_stats = convert_torchvision_resnet(sd)
    model = MonoRec(MonoRecConfig(cv_depth_steps=D))
    init = model.init({"params": jax.random.PRNGKey(0)}, _batch(), False)

    def paths(tree):
        return {
            jax.tree_util.keystr(p): np.asarray(v).shape
            for p, v in jax.tree_util.tree_leaves_with_path(tree)
        }

    assert paths(enc_params) == paths(init["params"]["encoder"])
    assert paths(enc_stats) == paths(init["batch_stats"]["encoder"])
    # A known weight survives the layout transpose: conv1 (O,I,kh,kw) ->
    # (kh,kw,I,O).
    w = sd["conv1.weight"].numpy()
    np.testing.assert_allclose(
        np.asarray(enc_params["Conv_0"]["kernel"]),
        np.transpose(w, (2, 3, 1, 0)),
    )


def test_init_state_injects_imagenet_weights(resnet_pth):
    model = MonoRec(MonoRecConfig(cv_depth_steps=D))
    batch = _batch()
    state = init_state_with_checkpoints(
        model, batch, jax.random.PRNGKey(0), optax.identity(),
        {"imagenet_weights": str(resnet_pth)},
    )
    sd = torch.load(resnet_pth, weights_only=True)
    np.testing.assert_allclose(
        np.asarray(state.params["encoder"]["Conv_0"]["kernel"]),
        np.transpose(sd["conv1.weight"].numpy(), (2, 3, 1, 0)),
    )
    np.testing.assert_allclose(
        np.asarray(state.batch_stats["encoder"]["_BN_0"]["BatchNorm_0"]["mean"]),
        sd["bn1.running_mean"].numpy(),
    )
    # Injected weights actually flow into the forward features.
    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["keyframe"],
        method=MonoRec.features,
    )
    rand = model.init({"params": jax.random.PRNGKey(0)}, batch, False)
    out_rand = model.apply(
        {"params": rand["params"], "batch_stats": rand["batch_stats"]},
        batch["keyframe"],
        method=MonoRec.features,
    )
    assert float(jnp.max(jnp.abs(out[0] - out_rand[0]))) > 1e-3


def test_missing_weights_returns_uninjected(tmp_path, monkeypatch):
    monkeypatch.delenv("MONOREC_TPU_IMAGENET_RESNET", raising=False)
    monkeypatch.setattr(
        "monorec_tpu.models.pretrained._HUB_DIRS", (tmp_path / "nope",)
    )
    params, stats, injected = inject_imagenet_encoder({"encoder": {}}, {})
    assert not injected


def test_mismatched_encoder_structure_refused(resnet_pth, tmp_path):
    """A .pth whose block counts differ from the model (e.g. resnet34
    weights under a resnet18 config) must be refused, not injected as a
    partial subtree that ScopeErrors at the first apply."""
    sd = torch.load(resnet_pth, weights_only=True)
    extra = dict(sd)
    for k, v in sd.items():
        if k.startswith("layer1.1."):
            extra[k.replace("layer1.1.", "layer1.2.")] = v.clone()
    p34 = tmp_path / "resnet34ish.pth"
    torch.save(extra, p34)

    model = MonoRec(MonoRecConfig(cv_depth_steps=D))
    init = model.init({"params": jax.random.PRNGKey(0)}, _batch(), False)
    params, stats, injected = inject_imagenet_encoder(
        init["params"], init["batch_stats"], str(p34)
    )
    assert not injected
    # Original params untouched.
    np.testing.assert_array_equal(
        np.asarray(params["encoder"]["Conv_0"]["kernel"]),
        np.asarray(init["params"]["encoder"]["Conv_0"]["kernel"]),
    )


def test_frozen_random_encoder_warns(capsys, caplog):
    warn_if_frozen_random_encoder(freeze_resnet=True, encoder_loaded=False)
    assert "RANDOM" in capsys.readouterr().err
    warn_if_frozen_random_encoder(freeze_resnet=True, encoder_loaded=True)
    assert "RANDOM" not in capsys.readouterr().err
