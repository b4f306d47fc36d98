"""Checkpoint-converter parity: torch reference architecture -> flax params.

This is the strongest parity test available without the downloadable
reference checkpoint: a torch oracle with reference-faithful state_dict keys
(tests/torch_reference.py) is converted via tools/convert_pth.py and must
produce numerically matching features/masks/depths in the flax model.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from convert_pth import convert_state_dict  # noqa: E402
from torch_reference import MonoRecTorch  # noqa: E402

from monorec_tpu.models import MonoRec, MonoRecConfig  # noqa: E402
from monorec_tpu.models.monorec import MonoRecConfig  # noqa: E402

B, H, W, F, D = 1, 32, 64, 2, 8


@pytest.fixture(scope="module")
def converted():
    torch.manual_seed(0)
    tmodel = MonoRecTorch(depth_steps=D).eval()
    # non-trivial BN stats so the conversion of running stats is exercised
    for m in tmodel.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.05)
            m.running_var.uniform_(0.5, 1.5)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params, batch_stats, unused = convert_state_dict(sd)
    assert not unused, f"unmapped reference keys: {unused[:10]}"
    return tmodel, params, batch_stats


def _flax_variables(model, params, batch_stats, batch):
    init = model.init({"params": jax.random.PRNGKey(0)}, batch, False)

    # Structural check: the converted tree must cover the flax tree exactly.
    def paths(tree):
        return {
            jax.tree_util.keystr(p): np.asarray(v).shape
            for p, v in jax.tree_util.tree_leaves_with_path(tree)
        }

    ip, cp = paths(init["params"]), paths(params)
    assert set(ip) == set(cp), (
        f"missing={sorted(set(ip) - set(cp))[:5]} extra={sorted(set(cp) - set(ip))[:5]}"
    )
    for k in ip:
        assert ip[k] == cp[k], f"shape mismatch at {k}: {ip[k]} vs {cp[k]}"
    ibs, cbs = paths(init.get("batch_stats", {})), paths(batch_stats)
    assert set(ibs) == set(cbs)

    return {"params": params, "batch_stats": batch_stats}


def test_full_converted_forward_matches_torch(converted):
    """Features + mask + depth through the flax model with converted weights
    must match the torch oracle end to end (CV supplied as shared input)."""
    tmodel, params, batch_stats = converted
    rng = np.random.default_rng(0)

    keyframe = rng.uniform(-0.5, 0.5, (B, H, W, 3)).astype(np.float32)
    cv = rng.uniform(-1, 1, (B, H, W, D)).astype(np.float32)
    sfcv = rng.uniform(-1, 1, (B, F, H, W, D)).astype(np.float32)

    model = MonoRec(MonoRecConfig(cv_depth_steps=D, no_cv=True))
    batch = {
        "keyframe": jnp.asarray(keyframe),
        "frames": jnp.zeros((B, F, H, W, 3), jnp.float32),
        "poses": jnp.tile(jnp.eye(4), (B, F, 1, 1)),
        "intrinsics": jnp.tile(jnp.eye(4), (B, F, 1, 1)),
        "keyframe_pose": jnp.tile(jnp.eye(4), (B, 1, 1)),
        "keyframe_intrinsics": jnp.tile(jnp.eye(4), (B, 1, 1)),
    }
    variables = _flax_variables(model, params, batch_stats, batch)

    @jax.jit
    def run(v, kf, cv_in, sfcv_in):
        feats = model.apply(v, kf, method=MonoRec.features)
        mask = model.apply(v, sfcv_in, feats, method=MonoRec.mask)
        preds = model.apply(v, cv_in, kf, feats, method=MonoRec.depth)
        return feats, mask, preds

    feats_j, mask_j, preds_j = run(
        variables, jnp.asarray(keyframe), jnp.asarray(cv), jnp.asarray(sfcv)
    )

    with torch.no_grad():
        t_kf = torch.from_numpy(keyframe).permute(0, 3, 1, 2)
        feats_t = tmodel._feature_extractor(t_kf + 0.5)
        t_sfcv = [
            torch.from_numpy(sfcv[:, i]).permute(0, 3, 1, 2) for i in range(F)
        ]
        mask_t = tmodel.att_module(t_sfcv, feats_t)
        t_cv = torch.from_numpy(cv).permute(0, 3, 1, 2)
        preds_t = tmodel.depth_module(t_cv, t_kf, feats_t)

    for i, (fj, ft) in enumerate(zip(feats_j, feats_t)):
        np.testing.assert_allclose(
            np.asarray(fj), ft.permute(0, 2, 3, 1).numpy(),
            rtol=1e-3, atol=2e-3, err_msg=f"feature scale {i}",
        )
    np.testing.assert_allclose(
        np.asarray(mask_j), mask_t.permute(0, 2, 3, 1).numpy(),
        rtol=1e-3, atol=2e-3,
    )
    lo, hi = 0.0025, 0.33
    for i, (pj, pt) in enumerate(zip(preds_j, preds_t)):
        pt_mapped = ((1 - pt) * lo + pt * hi).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(
            np.asarray(pj), pt_mapped, rtol=1e-3, atol=2e-4,
            err_msg=f"depth scale {i}",
        )
