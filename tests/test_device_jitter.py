"""On-device color jitter equals the host (numpy) jitter for the same
parameters — the TPU-native path that unblocked the cached data pipeline
(host hue rotation capped it at ~13 samples/s)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monorec_tpu.data.color_jitter import ColorJitterParams, apply_color_jitter
from monorec_tpu.models.augmentation import (
    ColorJitterBatch,
    apply_color_jitter_batch,
    jitter_image_keys,
    sample_color_jitter_batch,
)

B, H, W, F = 2, 16, 24, 2


@pytest.mark.parametrize("order", [(0, 1, 2, 3), (3, 2, 1, 0), (2, 0, 3, 1)])
def test_device_jitter_matches_numpy(order):
    rng = np.random.default_rng(0)
    imgs = rng.uniform(-0.5, 0.5, (B, H, W, 3)).astype(np.float32)
    vals = dict(brightness=1.15, contrast=0.9, saturation=1.1, hue=0.07)

    params = ColorJitterBatch(
        brightness=jnp.full((B,), vals["brightness"]),
        contrast=jnp.full((B,), vals["contrast"]),
        saturation=jnp.full((B,), vals["saturation"]),
        hue=jnp.full((B,), vals["hue"]),
        order=jnp.tile(jnp.asarray(order, jnp.int32), (B, 1)),
    )
    got = np.asarray(apply_color_jitter_batch(jnp.asarray(imgs), params))

    p = ColorJitterParams(order=order, **vals)
    want = np.stack([apply_color_jitter(im + 0.5, p) - 0.5 for im in imgs])
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_jitter_shared_across_frames_and_keys():
    rng = np.random.default_rng(1)
    batch = {
        "keyframe": jnp.asarray(
            rng.uniform(-0.5, 0.5, (B, H, W, 3)).astype(np.float32)
        ),
        "frames": jnp.asarray(
            rng.uniform(-0.5, 0.5, (B, F, H, W, 3)).astype(np.float32)
        ),
        "poses": jnp.zeros((B, F, 4, 4)),
    }
    out = jax.jit(jitter_image_keys)(batch, jax.random.PRNGKey(0))
    assert out["keyframe"].shape == batch["keyframe"].shape
    assert out["frames"].shape == batch["frames"].shape
    # Non-image keys untouched; images changed.
    np.testing.assert_array_equal(np.asarray(out["poses"]), np.zeros((B, F, 4, 4)))
    assert not np.allclose(np.asarray(out["keyframe"]), np.asarray(batch["keyframe"]))
    # Brightness direction agrees between a sample's keyframe and frames
    # (same parameter set), and differs across samples with high probability.
    d_kf = np.asarray(out["keyframe"] - batch["keyframe"]).mean(axis=(1, 2, 3))
    d_fr = np.asarray(out["frames"] - batch["frames"]).mean(axis=(1, 2, 3, 4))
    assert np.all(np.sign(d_kf) == np.sign(d_fr))


def test_sampled_params_within_bounds():
    p = sample_color_jitter_batch(jax.random.PRNGKey(3), 64)
    assert float(jnp.min(p.brightness)) >= 0.8 and float(jnp.max(p.brightness)) <= 1.2
    assert float(jnp.min(p.hue)) >= -0.1 and float(jnp.max(p.hue)) <= 0.1
    orders = np.asarray(p.order)
    assert np.all(np.sort(orders, axis=-1) == np.arange(4))
    assert len({tuple(o) for o in orders}) > 1


def test_trainer_with_on_device_jitter_runs():
    """The color_aug_on_device flag wires jitter into the jitted train step."""
    from monorec_tpu.data import DataLoader, SyntheticSweepDataset
    from monorec_tpu.losses import depth_loss
    from monorec_tpu.models import MonoRec, MonoRecConfig
    from monorec_tpu.train import Trainer
    from monorec_tpu.train.state import create_train_state, make_optimizer

    ds = SyntheticSweepDataset(length=8, target_image_size=(32, 64), frame_count=2)
    dl = DataLoader(ds, batch_size=8, shuffle=False, num_workers=1, seed=0)
    model = MonoRec(MonoRecConfig(cv_depth_steps=4, pretrain_mode=1))
    batch = next(iter(dl))
    tx = make_optimizer({"type": "Adam", "args": {"lr": 1e-4}})
    state = create_train_state(model, batch, jax.random.PRNGKey(0), tx)
    trainer = Trainer(
        model, depth_loss, [], state,
        {"trainer": {"epochs": 1, "len_epoch": 1, "alpha": 0.5,
                     "tensorboard": False, "log_step": 100,
                     "color_aug_on_device": True}},
        dl, run_dir="/tmp/jitter_trainer_test",
    )
    log = trainer._train_epoch(1)
    assert np.isfinite(log["loss"])
