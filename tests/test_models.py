"""Model composition tests: shapes, value ranges, pretrain modes.

NOTE: this host compiles XLA-CPU on a single core, so every test jits the
full forward (one compile per config) and configs are shared across tests via
module-scoped fixtures. The persistent compilation cache in conftest makes
repeat runs fast.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monorec_tpu.models import MonoRec, MonoRecConfig

B, H, W, F, D = 2, 32, 64, 2, 8


def _make_batch(rng, stereo=False, mask=False):
    def k():
        m = np.zeros((4, 4), np.float32)
        m[0, 0] = m[1, 1] = 40.0
        m[0, 2], m[1, 2] = W / 2 - 0.5, H / 2 - 0.5
        m[2, 2] = m[3, 3] = 1
        return np.tile(m, (B, 1, 1))

    poses = np.tile(np.eye(4, dtype=np.float32), (B, F, 1, 1))
    poses[:, 0, 0, 3] = 0.3
    poses[:, 1, 0, 3] = -0.3
    batch = {
        "keyframe": jnp.asarray(rng.uniform(-0.5, 0.5, (B, H, W, 3)).astype(np.float32)),
        "keyframe_pose": jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))),
        "keyframe_intrinsics": jnp.asarray(k()),
        "frames": jnp.asarray(rng.uniform(-0.5, 0.5, (B, F, H, W, 3)).astype(np.float32)),
        "poses": jnp.asarray(poses),
        "intrinsics": jnp.asarray(np.tile(k()[:, None], (1, F, 1, 1))),
    }
    if stereo:
        sp = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
        sp[:, 0, 3] = 0.54
        batch["stereoframe"] = jnp.asarray(
            rng.uniform(-0.5, 0.5, (B, H, W, 3)).astype(np.float32)
        )
        batch["stereoframe_pose"] = jnp.asarray(sp)
        batch["stereoframe_intrinsics"] = jnp.asarray(k())
    if mask:
        batch["mvobj_mask"] = jnp.asarray(
            (rng.uniform(0, 1, (B, H, W, 1)) > 0.9).astype(np.float32)
        )
    return batch


@pytest.fixture(scope="module")
def batch():
    return _make_batch(np.random.default_rng(0), stereo=True, mask=True)


def _run(cfg, batch, train=False, rngs=None):
    """Init + jitted forward; everything inside one compiled graph."""
    model = MonoRec(cfg)
    init_rngs = {"params": jax.random.PRNGKey(0)}
    run_rngs = rngs or {}
    if train:
        run_rngs.setdefault("dropout", jax.random.PRNGKey(1))
        run_rngs.setdefault("augment", jax.random.PRNGKey(2))
        init_rngs.update(run_rngs)

    @jax.jit
    def init_and_apply(b):
        variables = model.init(init_rngs, b, train)
        return model.apply(variables, b, train, rngs=run_rngs)

    return init_and_apply(batch)


def test_full_forward_contract(batch):
    out = _run(MonoRecConfig(cv_depth_steps=D), batch)

    assert out["cost_volume"].shape == (B, H, W, D)
    assert out["single_frame_cvs"].shape == (B, F, H, W, D)
    assert out["cv_mask"].shape == (B, H, W, 1)
    assert out["result"].shape == (B, H, W, 1)

    scales = [p.shape[1:3] for p in out["predicted_inverse_depths"]]
    assert scales == [(H, W), (H // 2, W // 2), (H // 4, W // 4), (H // 8, W // 8)]

    mask = np.asarray(out["cv_mask"])
    assert mask.min() >= 0 and mask.max() <= 1
    pred = np.asarray(out["result"])
    assert pred.min() >= 0.0025 - 1e-6 and pred.max() <= 0.33 + 1e-6

    feats = out["image_features"]
    assert [f.shape[-1] for f in feats] == [64, 64, 128, 256, 512]
    assert [f.shape[1] for f in feats] == [H // 2, H // 4, H // 8, H // 16, H // 32]


def test_pretrain_mode_1_and_augmentation_revert(batch):
    """Depth bootstrap: eval keeps CV (cv_mask==0). Train mode applies the
    flip augmentation and reverts predictions; since conv nets are not
    flip-equivariant the values legitimately differ from eval, so assert the
    contract (shapes, ranges, zero mask) rather than value equality."""
    cfg = MonoRecConfig(cv_depth_steps=D, pretrain_mode=1, augmentation="depth")
    model = MonoRec(cfg)

    @jax.jit
    def run(b):
        variables = model.init({"params": jax.random.PRNGKey(0)}, b, False)
        out_eval = model.apply(variables, b, False)
        out_train = model.apply(
            variables, b, True,
            rngs={"dropout": jax.random.PRNGKey(1), "augment": jax.random.PRNGKey(7)},
        )
        return out_eval, out_train

    out_eval, out_train = run(batch)
    assert np.all(np.asarray(out_eval["cv_mask"]) == 0)
    assert out_train["result"].shape == out_eval["result"].shape
    tr = np.asarray(out_train["result"])
    assert tr.min() >= 0.0025 - 1e-6 and tr.max() <= 0.33 + 1e-6


def test_hflip_involution_and_augment_consistency():
    from monorec_tpu.models.augmentation import (
        conditional_hflip,
        sample_flip_conditions,
    )

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 8, 12, 3)).astype(np.float32))
    cond = sample_flip_conditions(jax.random.PRNGKey(0), 4)
    y = conditional_hflip(conditional_hflip(x, cond), cond)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    # 5-D (frames) tensors flip along W too
    xf = jnp.asarray(rng.standard_normal((4, 2, 8, 12, 3)).astype(np.float32))
    yf = conditional_hflip(xf, cond)
    flipped_rows = np.asarray(cond)
    np.testing.assert_array_equal(
        np.asarray(yf[flipped_rows]), np.asarray(xf[flipped_rows])[:, :, :, ::-1, :]
    )


def test_pretrain_mode_2_returns_mask(batch):
    out = _run(MonoRecConfig(cv_depth_steps=D, pretrain_mode=2), batch)
    assert out["result"].shape == (B, H, W, 1)
    assert "predicted_inverse_depths" not in out
    m = np.asarray(out["result"])
    assert m.min() >= 0 and m.max() <= 1


def test_pretrain_mode_3_uses_mvobj_mask(batch):
    out = _run(MonoRecConfig(cv_depth_steps=D, pretrain_mode=3), batch)
    np.testing.assert_array_equal(
        np.asarray(out["cv_mask"]), np.asarray(batch["mvobj_mask"])
    )


def test_stereo_frames_enter_cost_volume(batch):
    out = _run(
        MonoRecConfig(cv_depth_steps=D, pretrain_mode=3, use_stereo=True), batch
    )
    assert out["single_frame_cvs"].shape == (B, F + 1, H, W, D)


def test_bfloat16_compute_dtype_close_to_f32(batch):
    """compute_dtype="bfloat16" runs the Mask/Depth U-Net convs in bf16
    (params stay f32) and must track the exact f32 path closely; outputs
    are re-cast so downstream losses/metrics always see f32."""
    model32 = MonoRec(MonoRecConfig(cv_depth_steps=D))
    model16 = MonoRec(MonoRecConfig(cv_depth_steps=D, compute_dtype="bfloat16"))

    @jax.jit
    def run_both(b):
        variables = model32.init({"params": jax.random.PRNGKey(0)}, b, False)
        return model32.apply(variables, b, False), model16.apply(variables, b, False)

    o32, o16 = run_both(batch)
    for key in ("result", "cv_mask"):
        a, c = np.asarray(o32[key]), np.asarray(o16[key])
        assert c.dtype == np.float32
        scale = np.abs(a).mean()
        assert np.abs(a - c).mean() / scale < 2e-2, key


def test_mask_aug_frames_fold_equals_vmap():
    """The frame-folded mask augmentation (one launch, params repeated per
    frame) must equal the per-frame vmap formulation exactly — the fold
    exists because vmapping the Pallas warp batches its SMEM coverage
    output into a block the TPU lowering rejects (first full-res stage-2
    run), so the semantics are pinned on the XLA path here."""
    import numpy as np

    from monorec_tpu.models.augmentation import (
        apply_mask_aug,
        apply_mask_aug_frames,
        sample_mask_aug_params,
    )

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-0.5, 0.5, (3, 2, 16, 64, 3)).astype(np.float32))
    params = sample_mask_aug_params(jax.random.PRNGKey(5), 3, 16, 64)
    folded = apply_mask_aug_frames(x, params)
    ref = jax.vmap(
        lambda xf: apply_mask_aug(xf, params), in_axes=1, out_axes=1
    )(x)
    np.testing.assert_allclose(np.asarray(folded), np.asarray(ref), atol=0)
