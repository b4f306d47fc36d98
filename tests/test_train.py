"""Training-stack tests on the virtual 8-device CPU mesh.

Heavy compiles (single-core XLA-CPU host): each test compiles at most one
train-step graph at tiny shapes; the persistent cache amortizes repeats.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from monorec_tpu.data import DataLoader, SyntheticSweepDataset
from monorec_tpu.losses import depth_loss
from monorec_tpu.metrics import get_metric
from monorec_tpu.models import MonoRec, MonoRecConfig
from monorec_tpu.parallel import make_mesh, shard_batch
from monorec_tpu.train import Trainer
from monorec_tpu.train.state import create_train_state, make_optimizer


def test_mesh_spans_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8  # conftest forces 8 virtual CPU devices


def test_shard_batch_warns_on_silent_replication(caplog):
    """A leaf whose batch dim is not divisible by the data axis degrades to
    replicated compute — that must be loud (one warning per process)."""
    import logging

    from monorec_tpu.parallel import mesh as mesh_mod

    mesh = make_mesh()
    batch = {"keyframe": jnp.ones((7, 4, 4, 3)), "scalar": jnp.float32(1.0)}
    mesh_mod._warned_replicated = False
    with caplog.at_level(logging.WARNING, logger="monorec_tpu.parallel.mesh"):
        out = shard_batch(batch, mesh)
    assert any("replicating" in r.message for r in caplog.records)
    assert out["keyframe"].shape == (7, 4, 4, 3)

    # divisible batches shard silently
    mesh_mod._warned_replicated = False
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="monorec_tpu.parallel.mesh"):
        out = shard_batch({"keyframe": jnp.ones((8, 4, 4, 3))}, mesh)
    assert not caplog.records
    assert not out["keyframe"].sharding.is_fully_replicated


def test_multidevice_numerical_equivalence_stage1():
    """The DataParallel guarantee the reference gets implicitly
    (base/base_trainer.py:26-29): the same divisible batch through the same
    params yields the same loss and updated params on an 8-device mesh as
    on 1 device. Proves the PartitionSpecs are correct (a wrong sharding
    that e.g. averaged gradients over half the batch would still be
    finite)."""
    ds = SyntheticSweepDataset(length=8, target_image_size=(32, 64), frame_count=2)
    dl = DataLoader(ds, batch_size=8, shuffle=False, num_workers=1, seed=11)
    model = MonoRec(
        MonoRecConfig(cv_depth_steps=4, pretrain_mode=1, augmentation="depth")
    )
    batch = next(iter(dl))
    # SGD, not Adam: the equivalence under test is the gradient all-reduce.
    # With SGD the param delta is lr*grad, so a ~1e-7 f32 reduction-order
    # difference stays ~1e-9 in the params. Adam's first step is
    # sign-like (m/sqrt(v) ~ +-1), which amplifies the same harmless
    # reordering noise to ~2*lr wherever a near-zero gradient flips sign —
    # that would test float round-off, not the sharding.
    tx = make_optimizer({"type": "SGD", "args": {"lr": 1e-2}})

    def run(n_devices):
        mesh = make_mesh(n_devices)
        state = create_train_state(model, batch, jax.random.PRNGKey(0), tx)
        trainer = Trainer(
            model, depth_loss, [], state,
            {"trainer": {"epochs": 1, "len_epoch": 1, "alpha": 0.5,
                         "tensorboard": False, "log_step": 100}},
            dl, run_dir="/tmp/monorec_equiv_test", mesh=mesh,
        )
        trainer._build_steps()
        sharded = shard_batch(batch, mesh)
        new_state, loss_dict, _, _ = trainer._train_step(
            trainer.state, sharded, jax.random.PRNGKey(1), jnp.float32(0.5)
        )
        return float(loss_dict["loss"]), jax.tree_util.tree_map(
            np.asarray, new_state.params
        )

    loss_1, params_1 = run(1)
    loss_8, params_8 = run(8)
    np.testing.assert_allclose(loss_8, loss_1, rtol=1e-5)
    # atol absorbs f32 reduction-order noise on near-zero leaves (measured
    # max 1.1e-7 on a ~1e-6 bias); a sharding bug (e.g. gradients averaged
    # over half the batch) shifts params by ~0.5*lr*grad >> 5e-7 and the
    # loss itself, so it cannot hide inside these tolerances.
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=5e-7),
        params_1, params_8,
    )


def test_2d_mesh_train_step():
    """The mesh axes stay abstract (mesh.py docstring): a (data=4, model=2)
    mesh with the batch sharded over "data" only runs a full stage-1 train
    step — params/opt-state replicate over both axes, grads all-reduce."""
    mesh = make_mesh(axes=(("data", 4), ("model", 2)))
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {"data": 4, "model": 2}

    ds = SyntheticSweepDataset(length=8, target_image_size=(32, 64), frame_count=2)
    dl = DataLoader(ds, batch_size=8, shuffle=False, num_workers=1, seed=7)
    model = MonoRec(MonoRecConfig(cv_depth_steps=4, pretrain_mode=1,
                                  augmentation="depth"))
    batch = next(iter(dl))
    tx = make_optimizer({"type": "Adam", "args": {"lr": 1e-4, "amsgrad": True}})
    state = create_train_state(model, batch, jax.random.PRNGKey(0), tx)
    trainer = Trainer(
        model, depth_loss, [], state,
        {"trainer": {"epochs": 1, "len_epoch": 1, "alpha": 0.5,
                     "tensorboard": False, "log_step": 100}},
        dl, run_dir="/tmp/monorec_2dmesh_test", mesh=mesh,
    )
    trainer._build_steps()
    sharded = shard_batch(batch, trainer.mesh)
    # batch dim 8 divides the data axis (4): sharded, not replicated
    assert not sharded["keyframe"].sharding.is_fully_replicated
    before = np.asarray(jax.tree_util.tree_leaves(trainer.state.params["depth_net"])[0])
    new_state, loss_dict, _, _ = trainer._train_step(
        trainer.state, sharded, jax.random.PRNGKey(1), 0.5
    )
    assert np.isfinite(float(loss_dict["loss"]))
    after = np.asarray(jax.tree_util.tree_leaves(new_state.params["depth_net"])[0])
    assert not np.allclose(before, after)


@pytest.fixture(scope="module")
def stage1_setup(tmp_path_factory):
    ds = SyntheticSweepDataset(length=16, target_image_size=(32, 64), frame_count=2)
    dl = DataLoader(ds, batch_size=8, shuffle=True, num_workers=2, seed=3)
    cfg = MonoRecConfig(cv_depth_steps=4, pretrain_mode=1, augmentation="depth")
    model = MonoRec(cfg)
    batch = next(iter(dl))
    tx = make_optimizer({"type": "Adam", "args": {"lr": 1e-4, "amsgrad": True}})
    state = create_train_state(model, batch, jax.random.PRNGKey(0), tx)
    trainer = Trainer(
        model, depth_loss, [get_metric("abs_rel_sparse_metric")], state,
        {"trainer": {"epochs": 1, "len_epoch": 2, "alpha": 0.5,
                     "max_distance": 80, "tensorboard": False, "log_step": 100}},
        dl, run_dir=str(tmp_path_factory.mktemp("run")),
    )
    return trainer


def test_stage1_train_step_runs_and_updates(stage1_setup):
    trainer = stage1_setup
    params_before = jax.tree_util.tree_map(np.asarray, trainer.state.params)
    log = trainer._train_epoch(1)
    assert np.isfinite(log["loss"])
    # some depth-module parameter must have moved
    moved = jax.tree_util.tree_reduce(
        lambda acc, pair: acc or not np.allclose(pair[0], pair[1]),
        jax.tree_util.tree_map(
            lambda a, b: (np.asarray(a), np.asarray(b)),
            params_before["depth_net"],
            trainer.state.params["depth_net"],
            is_leaf=lambda x: isinstance(x, np.ndarray) or hasattr(x, "shape"),
        ),
        False,
    )
    assert moved


def test_module_timing_surface(stage1_setup):
    """cv_module_time analog (reference monorec_model.py:151,276-278): the
    trainer can wall-clock each submodule as its own compiled program."""
    trainer = stage1_setup
    batch = shard_batch(next(iter(trainer.data_loader)), trainer.mesh)
    times = trainer._module_times(batch)
    # pretrain_mode=1: no mask module; cv/resnet/depth must be present
    assert set(times) == {"cv_module_time", "resnet_module_time", "depth_module_time"}
    assert all(v > 0 for v in times.values())


def test_checkpoint_roundtrip(stage1_setup, tmp_path):
    from monorec_tpu.train.checkpoints import (
        load_checkpoint,
        load_submodule_params,
        save_checkpoint,
    )

    trainer = stage1_setup
    path = save_checkpoint(tmp_path, "checkpoint", trainer.state, 3, 0.123)
    payload = load_checkpoint(path)
    assert payload["meta"]["epoch"] == 3
    got = {
        jax.tree_util.keystr(p): np.asarray(v)
        for p, v in jax.tree_util.tree_leaves_with_path(payload["params"]["depth_net"])
    }
    want = {
        jax.tree_util.keystr(p): np.asarray(v)
        for p, v in jax.tree_util.tree_leaves_with_path(
            trainer.state.params["depth_net"]
        )
    }
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_array_equal(got[k], want[k])

    # partial loading: zero the live params, restore only depth_net
    zeroed = jax.tree_util.tree_map(lambda x: x * 0, trainer.state.params)
    restored = load_submodule_params(zeroed, [str(path)], ["depth_net"])
    leaf = jax.tree_util.tree_leaves(restored["depth_net"])[0]
    assert np.any(np.asarray(leaf) != 0)
    leaf_enc = jax.tree_util.tree_leaves(restored["encoder"])[0]
    assert np.all(np.asarray(leaf_enc) == 0)


def test_resume_optimizer_type_guard(stage1_setup, tmp_path):
    """Resume restores optimizer state only if the optimizer type matches
    (reference base/base_trainer.py:180-188): a checkpoint saved with Adam
    resumed under an SGD config warns and proceeds with params only."""
    from monorec_tpu.train.checkpoints import save_checkpoint

    trainer = stage1_setup
    save_checkpoint(
        tmp_path, "ckpt", trainer.state, 5, 0.5, optimizer_type="Adam"
    )

    old_type, old_state = trainer.optimizer_type, trainer.state
    sgd = make_optimizer({"type": "SGD", "args": {"lr": 1e-3}})
    try:
        trainer.optimizer_type = "SGD"
        trainer.state = trainer.state.replace(
            tx=sgd, opt_state=sgd.init(trainer.state.params)
        )
        sgd_opt_before = trainer.state.opt_state
        trainer.resume(str(tmp_path / "ckpt"))
        assert trainer.start_epoch == 6
        # The Adam opt_state must NOT have been forced onto the SGD state.
        assert jax.tree_util.tree_structure(
            trainer.state.opt_state
        ) == jax.tree_util.tree_structure(sgd_opt_before)
    finally:
        trainer.optimizer_type, trainer.state = old_type, old_state
        trainer.start_epoch = 1


@pytest.mark.parametrize(
    "opt_cfg",
    [
        {"type": "Adam", "args": {"lr": 1e-3, "amsgrad": True}},
        {"type": "AdamW", "args": {"lr": 1e-3, "weight_decay": 0.02}},
        {"type": "SGD", "args": {"lr": 1e-2, "momentum": 0.9, "nesterov": True}},
        {"type": "RMSprop", "args": {"lr": 1e-3, "alpha": 0.95}},
        {"type": "Adagrad", "args": {"lr": 1e-2}},
        {"type": "Adadelta", "args": {"lr": 1.0}},
        {"type": "Adamax", "args": {"lr": 1e-3}},
        {"type": "RAdam", "args": {"lr": 1e-3}},
        {"type": "NAdam", "args": {"lr": 1e-3}},
        {"type": "Adam", "args": {"lr": 1e-3, "weight_decay": 0.01}},
    ],
)
def test_optimizer_reflection_surface(opt_cfg):
    """Every torch.optim name the reference's reflection factory could
    produce (utils/parse_config.py:72-89) maps to a working optax
    transform that changes the params."""
    tx = make_optimizer(opt_cfg)
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    opt_state = tx.init(params)
    grads = {"w": jnp.full((4, 4), 0.5), "b": jnp.full((4,), 0.5)}
    updates, _ = tx.update(grads, opt_state, params)
    new = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
    assert not np.allclose(np.asarray(new["w"]), np.asarray(params["w"]))
    assert np.all(np.isfinite(np.asarray(new["w"])))


def test_adamw_explicit_zero_weight_decay_is_honored():
    """torch AdamW defaults weight_decay to 0.01 only when ABSENT; an
    explicit 0.0 disables decay. With zero grads, decay is the only force
    on the params."""

    def decay_only_update(opt_cfg):
        tx = make_optimizer(opt_cfg)
        params = {"w": jnp.ones((4,))}
        updates, _ = tx.update(
            {"w": jnp.zeros((4,))}, tx.init(params), params
        )
        return float(jnp.max(jnp.abs(updates["w"])))

    assert decay_only_update(
        {"type": "AdamW", "args": {"lr": 1e-2, "weight_decay": 0.0}}
    ) == 0.0
    assert decay_only_update({"type": "AdamW", "args": {"lr": 1e-2}}) > 0.0


@pytest.mark.parametrize(
    "sched_cfg,at,expect",
    [
        ({"type": "StepLR", "args": {"step_size": 2, "gamma": 0.1}}, 25, 1e-5),
        ({"type": "ExponentialLR", "args": {"gamma": 0.5}}, 15, 5e-5),
        (
            {"type": "MultiStepLR", "args": {"milestones": [1, 3], "gamma": 0.1}},
            25, 1e-5,  # only the epoch-1 milestone (step 10) has passed
        ),
        (
            {"type": "MultiStepLR", "args": {"milestones": [1, 3], "gamma": 0.1}},
            35, 1e-6,  # both milestones passed
        ),
        ({"type": "ConstantLR", "args": {}}, 25, 1e-4),
        ({"type": "LinearLR", "args": {"start_factor": 0.5, "total_iters": 1}},
         10, 1e-4),
    ],
)
def test_scheduler_reflection_surface(sched_cfg, at, expect):
    """torch lr_scheduler configs map to per-step optax schedules with
    epoch-granular transitions (steps_per_epoch=10 here)."""
    from monorec_tpu.train.state import make_schedule

    sched = make_schedule(1e-4, sched_cfg, steps_per_epoch=10)
    np.testing.assert_allclose(float(sched(at)), expect, rtol=1e-5)


def test_cosine_schedule_reaches_eta_min():
    from monorec_tpu.train.state import make_schedule

    sched = make_schedule(
        1e-3,
        {"type": "CosineAnnealingLR", "args": {"T_max": 4, "eta_min": 1e-5}},
        steps_per_epoch=10,
    )
    np.testing.assert_allclose(float(sched(0)), 1e-3, rtol=1e-5)
    np.testing.assert_allclose(float(sched(40)), 1e-5, rtol=1e-4)


def test_dryrun_multichip_full_stage4():
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_stage2_mask_training_step():
    """Stage-2 protocol: mask augmentation + MaskModule + class-balanced BCE."""
    from monorec_tpu.losses import mask_loss
    from monorec_tpu.train import MonoRecTrainer

    ds = SyntheticSweepDataset(
        length=8, target_image_size=(32, 64), frame_count=2,
        return_stereo=True, return_mvobj_mask=2,
    )
    dl = DataLoader(ds, batch_size=8, shuffle=False, num_workers=1, seed=5)
    cfg = MonoRecConfig(cv_depth_steps=4, pretrain_mode=2, augmentation="mask")
    model = MonoRec(cfg)
    batch = next(iter(dl))
    tx = make_optimizer({"type": "Adam", "args": {"lr": 1e-4}})
    state = create_train_state(model, batch, jax.random.PRNGKey(0), tx)

    trainer = MonoRecTrainer(
        model, mask_loss, [], state,
        {"trainer": {"compute_mono_pred": False, "compute_stereo_pred": False,
                     "epochs": 1, "len_epoch": 1, "alpha": 0.5,
                     "tensorboard": False, "log_step": 100}},
        dl, run_dir="/tmp/monorec_stage2_test",
    )
    trainer._build_steps()
    from monorec_tpu.parallel import shard_batch

    # the train step donates the state, so snapshot params first
    before = np.asarray(jax.tree_util.tree_leaves(trainer.state.params["att"])[0])
    sharded = shard_batch(batch, trainer.mesh)
    new_state, loss_dict, metrics, viz = trainer._train_step(
        trainer.state, sharded, jax.random.PRNGKey(1), 0.5
    )
    assert np.isfinite(float(loss_dict["loss"]))
    assert 0.0 <= float(loss_dict["iou"]) <= 1.0
    assert viz["result"].shape == (8, 32, 64, 1)
    # mask-module params must receive gradient
    after = np.asarray(jax.tree_util.tree_leaves(new_state.params["att"])[0])
    assert not np.allclose(before, after)


def test_apply_gradients_guarded_skips_nonfinite():
    """skip_nonfinite_updates: a NaN/inf gradient turns the whole update
    into a no-op (params, opt_state, step unchanged); finite gradients
    apply exactly as the unguarded path. Off -> skipped is None and the
    update always applies (reference-parity default)."""
    import optax

    from monorec_tpu.train.state import TrainState
    from monorec_tpu.train.trainer import apply_gradients_guarded

    params = {"w": jnp.ones((4,)), "b": jnp.zeros((2,))}
    tx = optax.adam(1e-1)
    state = TrainState(
        step=0, params=params, batch_stats={}, opt_state=tx.init(params), tx=tx
    )

    finite = {"w": jnp.full((4,), 0.5), "b": jnp.ones((2,))}
    bad = {"w": jnp.full((4,), 0.5).at[1].set(jnp.nan), "b": jnp.ones((2,))}

    # Guard off: applies, skipped is None (zero-cost path).
    st_off, skipped = apply_gradients_guarded(state, finite, False)
    assert skipped is None
    assert not np.allclose(st_off.params["w"], params["w"])

    # Guard on + finite grads: identical update to the unguarded path.
    st_ok, skipped = apply_gradients_guarded(state, finite, True)
    assert float(skipped) == 0.0
    np.testing.assert_array_equal(
        np.asarray(st_ok.params["w"]), np.asarray(st_off.params["w"])
    )
    assert int(st_ok.step) == 1

    # Guard on + NaN grad: full no-op, step does not advance.
    st_bad, skipped = apply_gradients_guarded(state, bad, True)
    assert float(skipped) == 1.0
    np.testing.assert_array_equal(np.asarray(st_bad.params["w"]), np.asarray(params["w"]))
    np.testing.assert_array_equal(np.asarray(st_bad.params["b"]), np.asarray(params["b"]))
    assert int(st_bad.step) == 0
    chex_leaves = jax.tree_util.tree_leaves(st_bad.opt_state)
    orig_leaves = jax.tree_util.tree_leaves(state.opt_state)
    for a, b in zip(chex_leaves, orig_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Inside a donated jitted step (how the trainers use it).
    @jax.jit
    def step(state, grads):
        return apply_gradients_guarded(state, grads, True)

    st_j, skipped = step(state, bad)
    assert float(skipped) == 1.0
    np.testing.assert_array_equal(np.asarray(st_j.params["w"]), np.asarray(params["w"]))


def test_joint_depth_decode_equals_two_pass():
    """The batched 2B-depth-decode formulation (one U-Net pass for the mono
    and stereo decodes, same weights — reference runs them separately,
    ``trainer/monorec_trainer.py:56-60,87-90``) must match the two-pass
    formulation in both the stage-4 loss and its parameter gradients: the
    decoder has no cross-batch ops and the stereo half is detached the same
    way, so the programs are mathematically identical."""
    from monorec_tpu.losses import depth_refinement_loss
    from monorec_tpu.train import MonoRecTrainer

    ds = SyntheticSweepDataset(
        length=4, target_image_size=(32, 64), frame_count=2, return_stereo=True
    )
    dl = DataLoader(ds, batch_size=4, shuffle=False, num_workers=1, seed=3)
    cfg = MonoRecConfig(
        cv_depth_steps=4, pretrain_mode=0, augmentation="depth",
        freeze_module=("att",),
    )
    model = MonoRec(cfg)
    batch = next(iter(dl))
    tx = make_optimizer({"type": "Adam", "args": {"lr": 1e-5}})
    state = create_train_state(model, batch, jax.random.PRNGKey(0), tx)

    def run(joint):
        trainer = MonoRecTrainer(
            model, depth_refinement_loss, [], state,
            {"trainer": {"compute_mono_pred": True, "compute_stereo_pred": True,
                         "compute_mask": True, "mult_mask_on_cv": True,
                         "joint_depth_decode": joint,
                         "epochs": 1, "len_epoch": 1, "alpha": 0.5,
                         "tensorboard": False, "log_step": 100}},
            dl, run_dir="/tmp/monorec_joint_decode_test",
            options=("stereo", "stereo_repr"),
        )

        def loss_fn(params):
            loss_dict, _ = trainer._feed(
                params, state.batch_stats, batch, jax.random.PRNGKey(1),
                True, jnp.float32(0.5),
            )
            return loss_dict["loss"]

        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(state.params)
        return float(loss), jax.tree_util.tree_map(np.asarray, grads)

    loss_j, grads_j = run(True)
    loss_t, grads_t = run(False)
    np.testing.assert_allclose(loss_j, loss_t, rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7),
        grads_j, grads_t,
    )


def test_multidevice_numerical_equivalence_stage4():
    """Stage-4 (depth refinement) variant of the stage-1 equivalence test:
    loss AND updated params equal 1-vs-8 devices through the full
    MonoRecTrainer step (stereo pass + mask + mult_mask_on_cv +
    depth_refinement_loss). A sharding bug confined to the stage-4-only
    branches (e.g. the stereo pseudo-GT backward) cannot hide behind the
    stage-1 test. SGD for the same tolerance rationale as stage 1."""
    from monorec_tpu.losses import depth_refinement_loss
    from monorec_tpu.train import MonoRecTrainer

    ds = SyntheticSweepDataset(
        length=8, target_image_size=(32, 64), frame_count=2, return_stereo=True
    )
    dl = DataLoader(ds, batch_size=8, shuffle=False, num_workers=1, seed=13)
    cfg = MonoRecConfig(
        cv_depth_steps=4, pretrain_mode=0, augmentation="depth",
        freeze_module=("att",),
    )
    model = MonoRec(cfg)
    batch = next(iter(dl))
    tx = make_optimizer({"type": "SGD", "args": {"lr": 1e-2}})

    def run(n_devices):
        mesh = make_mesh(n_devices)
        state = create_train_state(model, batch, jax.random.PRNGKey(0), tx)
        trainer = MonoRecTrainer(
            model, depth_refinement_loss, [], state,
            {"trainer": {"compute_mono_pred": True, "compute_stereo_pred": True,
                         "compute_mask": True, "mult_mask_on_cv": True,
                         "epochs": 1, "len_epoch": 1, "alpha": 0.5,
                         "tensorboard": False, "log_step": 100}},
            dl, run_dir="/tmp/monorec_equiv_stage4_test", mesh=mesh,
            options=("stereo", "stereo_repr"),
        )
        trainer._build_steps()
        sharded = shard_batch(batch, mesh)
        new_state, loss_dict, _, _ = trainer._train_step(
            trainer.state, sharded, jax.random.PRNGKey(1), jnp.float32(0.5)
        )
        return float(loss_dict["loss"]), jax.tree_util.tree_map(
            np.asarray, new_state.params
        )

    loss_1, params_1 = run(1)
    loss_8, params_8 = run(8)
    np.testing.assert_allclose(loss_8, loss_1, rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=5e-7),
        params_1, params_8,
    )
