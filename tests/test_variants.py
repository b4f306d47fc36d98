"""Previously-untested variants (VERDICT r1 "Next" #5):

* SimpleMaskModule forward vs a converted torch oracle
  (``monorec_model.py:388-473``);
* ``combine_frames="rnd"`` reprojection combining
  (``common_losses.py:100-108``);
* ``dist_diff_loss`` option of the mask refinement loss vs a numpy oracle
  (``monorec_loss.py:168-179``);
* ``concat_mono_stereo`` batch doubling in the stage 2-4 trainer protocol
  (``trainer/monorec_trainer.py:103-118``).
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

import torch_reference as tr  # noqa: E402
from convert_pth import Converter  # noqa: E402

from monorec_tpu.losses.common import reprojection_loss  # noqa: E402
from monorec_tpu.losses.monorec_losses import mask_refinement_loss  # noqa: E402
from monorec_tpu.models.mask_module import SimpleMaskModule  # noqa: E402

B, H, W, F, D = 1, 32, 64, 2, 8


def _image_features(rng):
    chans = (64, 64, 128, 256, 512)
    return [
        jnp.asarray(
            rng.uniform(-1, 1, (B, H // 2 ** (i + 1), W // 2 ** (i + 1), c)).astype(
                np.float32
            )
        )
        for i, c in enumerate(chans)
    ]


def test_simple_mask_module_matches_torch_oracle():
    torch.manual_seed(0)
    tmodel = tr.SimpleMaskModule(depth_steps=D).eval()
    sd = {
        f"att_module.{k}": v.numpy() for k, v in tmodel.state_dict().items()
    }
    c = Converter(sd)
    c.convert_mask()
    assert not c.unused_keys(), c.unused_keys()[:5]

    rng = np.random.default_rng(0)
    sfcv = rng.uniform(-1, 1, (B, F, H, W, D)).astype(np.float32)
    # Plant exact zeros so the nonzero-count averaging is exercised.
    sfcv[:, 0, : H // 4] = 0.0
    keyframe = rng.uniform(-0.5, 0.5, (B, H, W, 3)).astype(np.float32)
    pred = rng.uniform(0.01, 0.3, (B, H, W, 1)).astype(np.float32)
    feats = _image_features(rng)

    model = SimpleMaskModule(D)
    out_j = model.apply(
        {"params": c.params["att"]},
        jnp.asarray(sfcv), jnp.asarray(keyframe), jnp.asarray(pred), feats,
    )

    with torch.no_grad():
        out_t = tmodel(
            [torch.from_numpy(sfcv[:, i]).permute(0, 3, 1, 2) for i in range(F)],
            torch.from_numpy(keyframe).permute(0, 3, 1, 2),
            torch.from_numpy(pred).permute(0, 3, 1, 2),
            [torch.from_numpy(np.asarray(f)).permute(0, 3, 1, 2) for f in feats],
        )
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.permute(0, 2, 3, 1).numpy(), rtol=1e-3, atol=2e-3
    )


def _reproj_data(rng, b=2):
    def k():
        m = np.zeros((4, 4), np.float32)
        m[0, 0] = m[1, 1] = 40.0
        m[0, 2], m[1, 2] = W / 2 - 0.5, H / 2 - 0.5
        m[2, 2] = m[3, 3] = 1
        return np.tile(m, (b, 1, 1))

    poses = np.tile(np.eye(4, dtype=np.float32), (b, F, 1, 1))
    poses[:, 0, 0, 3] = 0.3
    poses[:, 1, 0, 3] = -0.3
    return {
        "keyframe": jnp.asarray(
            rng.uniform(-0.5, 0.5, (b, H, W, 3)).astype(np.float32)
        ),
        "keyframe_pose": jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))),
        "keyframe_intrinsics": jnp.asarray(k()),
        "frames": jnp.asarray(
            rng.uniform(-0.5, 0.5, (b, F, H, W, 3)).astype(np.float32)
        ),
        "poses": jnp.asarray(poses),
        "intrinsics": jnp.asarray(np.tile(k()[:, None], (1, F, 1, 1))),
    }


def test_combine_frames_rnd_selects_one_frame_per_sample():
    """rnd combining picks ONE source frame per batch element (reference
    gathers a random index, common_losses.py:104-106): every pixel of the
    rnd error map must equal that pixel in one of the per-frame maps."""
    rng = np.random.default_rng(1)
    b = 4
    data = _reproj_data(rng, b)
    inv_depth = jnp.asarray(
        rng.uniform(0.05, 0.3, (b, H, W, 1)).astype(np.float32)
    )

    err_rnd = reprojection_loss(
        inv_depth, data, reduce=False, combine_frames="rnd",
        rng=jax.random.PRNGKey(3),
    )
    per_frame = []
    for i in range(F):
        sub = dict(
            data,
            frames=data["frames"][:, i : i + 1],
            poses=data["poses"][:, i : i + 1],
            intrinsics=data["intrinsics"][:, i : i + 1],
        )
        per_frame.append(np.asarray(reprojection_loss(inv_depth, sub, reduce=False)))
    err_rnd = np.asarray(err_rnd)
    matched = 0
    for bi in range(b):
        for i in range(F):
            if np.allclose(err_rnd[bi], per_frame[i][bi], atol=1e-6):
                matched += 1
                break
    assert matched == b
    # Different keys must eventually pick different frames (not constant).
    picks = set()
    for key in range(6):
        e = np.asarray(
            reprojection_loss(
                inv_depth, data, reduce=False, combine_frames="rnd",
                rng=jax.random.PRNGKey(key),
            )
        )
        for i in range(F):
            if np.allclose(e[0], per_frame[i][0], atol=1e-6):
                picks.add(i)
    assert len(picks) > 1


def test_dist_diff_loss_matches_numpy_oracle():
    """The dist_diff option adds -log(cv_mask) over a dilated majority-vote
    mask of near-depth GT pixels, cropped, /8 (monorec_loss.py:168-179)."""
    rng = np.random.default_rng(2)
    b = 1
    data = _reproj_data(rng, b)
    gt = np.zeros((b, H, W, 1), np.float32)
    gt[0, 8:24, 16:48, 0] = 0.2  # valid GT region
    mono = np.full((b, H, W, 1), 0.005, np.float32)  # below the threshold
    stereo = rng.uniform(0.01, 0.3, (b, H, W, 1)).astype(np.float32)
    cv_mask = rng.uniform(0.1, 0.9, (b, H, W, 1)).astype(np.float32)
    mvobj = (rng.uniform(0, 1, (b, H, W, 1)) > 0.8).astype(np.float32)

    sp = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))
    sp[:, 0, 3] = 0.54
    data.update(
        target=jnp.asarray(gt),
        mono_pred=[jnp.asarray(mono)],
        stereo_pred=[jnp.asarray(stereo)],
        cv_mask=jnp.asarray(cv_mask),
        mvobj_mask=jnp.asarray(mvobj),
        inv_depth_min=jnp.float32(0.33),
        inv_depth_max=jnp.float32(0.0025),
        stereoframe=jnp.asarray(
            rng.uniform(-0.5, 0.5, (b, H, W, 3)).astype(np.float32)
        ),
        stereoframe_pose=jnp.asarray(sp),
        stereoframe_intrinsics=data["keyframe_intrinsics"],
    )

    base = mask_refinement_loss(data, 0.5, None, ())
    with_dd = mask_refinement_loss(data, 0.5, None, ("dist_diff_loss",))

    # numpy oracle (scale 0 -> b = 16)
    bb = 16
    thresh = (0.33 - 0.0025) / 32 * 2 + 0.0025
    dd = (mono[0, :, :, 0] < thresh) & (gt[0, :, :, 0] > 0)
    padded = np.pad(dd.astype(np.float64), bb // 2)
    box = np.zeros((H, W))
    for y in range(H):
        for x in range(W):
            box[y, x] = padded[y : y + bb + 1, x : x + bb + 1].sum()
    vote = box >= ((bb + 1) ** 2) / 4
    crop = vote[bb * 4 : -bb, bb : -bb]
    logp = -np.log(np.clip(cv_mask[0, bb * 4 : -bb, bb : -bb, 0], 1e-12, 1))
    expected = logp[crop].sum() / max(crop.sum(), 1) * 2.0**-3

    got = float(with_dd["dist_diff_0"])
    assert got == pytest.approx(expected, rel=1e-5)
    assert float(with_dd["loss"]) == pytest.approx(
        float(base["loss"]) + expected, rel=1e-4
    )


def test_concat_mono_stereo_batch_doubling():
    """concat_mono_stereo doubles the batch (mono preds | stereo preds) and
    keeps gradients flowing through the stereo branch
    (trainer/monorec_trainer.py:56-60,103-118)."""
    import optax

    from monorec_tpu.models import MonoRec, MonoRecConfig
    from monorec_tpu.losses import depth_loss
    from monorec_tpu.train.monorec_trainer import MonoRecTrainer
    from monorec_tpu.train.state import create_train_state

    rng = np.random.default_rng(3)
    b = 2
    data = _reproj_data(rng, b)
    sp = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))
    sp[:, 0, 3] = 0.54
    batch = dict(
        data,
        stereoframe=jnp.asarray(
            rng.uniform(-0.5, 0.5, (b, H, W, 3)).astype(np.float32)
        ),
        stereoframe_pose=jnp.asarray(sp),
        stereoframe_intrinsics=data["keyframe_intrinsics"],
        target=jnp.asarray(rng.uniform(0.01, 0.3, (b, H, W, 1)).astype(np.float32)),
    )

    cfg = MonoRecConfig(cv_depth_steps=D, pretrain_mode=1, use_stereo=False)
    model = MonoRec(cfg)
    tx = optax.identity()
    state = create_train_state(model, batch, jax.random.PRNGKey(0), tx)
    trainer = MonoRecTrainer(
        model, depth_loss, [], state,
        {
            "trainer": {
                "compute_mask": False,
                "compute_stereo_pred": True,
                "concat_mono_stereo": True,
                "epochs": 1,
                "tensorboard": False,
            },
            "optimizer": {"type": "Adam"},
        },
        data_loader=type(
            "L", (), {"batch_size": b, "__len__": lambda s: 1,
                      "__iter__": lambda s: iter([batch])}
        )(),
        run_dir="/tmp/monorec_variants_test",
        options=("stereo",),
    )

    loss_dict, out = trainer._feed(
        state.params, state.batch_stats, batch, jax.random.PRNGKey(1), False, 0.5
    )
    # Doubled batch: first half mono, second half stereo predictions.
    assert out["keyframe"].shape[0] == 2 * b
    assert out["result"].shape[0] == 2 * b
    np.testing.assert_allclose(
        np.asarray(out["result"][:b]), np.asarray(out["mono_pred"][0][:b])
    )
    np.testing.assert_allclose(
        np.asarray(out["result"][b:]), np.asarray(out["stereo_pred"][0][:b])
    )

    # Stereo branch must carry gradient (no stop_gradient in concat mode).
    def loss_of(params):
        ld, o = trainer._feed(
            params, state.batch_stats, batch, jax.random.PRNGKey(1), False, 0.5
        )
        return jnp.sum(o["stereo_pred"][0] ** 2)

    grads = jax.grad(loss_of)(state.params)
    gnorm = sum(
        float(jnp.sum(jnp.abs(g)))
        for g in jax.tree_util.tree_leaves(grads["depth_net"])
    )
    assert gnorm > 0.0
