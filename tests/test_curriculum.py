"""Full 4-stage curriculum end-to-end through the real CLIs.

Mirrors the reference training recipe (README.md:109-113 + the four
``configs/train/monorec/*.json``) at toy scale on the synthetic dataset:

  stage 1 (depth bootstrap, ``train.py``)        -> checkpoint
  stage 2 (mask bootstrap, ``train_monorec.py``) -> checkpoint
  stage 3 (mask refinement) loads depth+mask checkpoints
  stage 4 (depth refinement) loads the stage-3 checkpoint, freezes att

Stage 3 runs with lr=0 (via the ``--lr`` CLI override) so the curriculum
HANDOFF itself is asserted: the checkpoint it saves must carry stage-1's
depth_net params and stage-2's att params bit-for-bit."""

import json
from pathlib import Path

import numpy as np
import pytest

from monorec_tpu.cli.train import main as train_main
from monorec_tpu.cli.train_monorec import main as train_monorec_main
from monorec_tpu.train.checkpoints import load_checkpoint


def _base_loader(stereo=False, mvobj=0):
    return {
        "type": "SyntheticSweepDataloader",
        "args": {
            "length": 8, "batch_size": 2, "frame_count": 2,
            "target_image_size": [32, 64], "shuffle": True,
            "validation_split": 0.0, "num_workers": 1,
            "return_stereo": stereo, "return_mvobj_mask": mvobj,
        },
    }


def _arch(**kw):
    args = {
        "cv_depth_steps": 4, "use_mono": True, "use_stereo": False,
        "inv_depth_min_max": [0.33, 0.0025],
    }
    args.update(kw)
    return {"type": "MonoRecModel", "args": args}


def _trainer(save_dir, **kw):
    t = {
        "epochs": 1, "len_epoch": 2, "save_dir": str(save_dir),
        "save_period": 1, "verbosity": 0, "log_step": 100, "alpha": 0.5,
        "max_distance": 80, "timestamp_replacement": "fixed",
        "tensorboard": False,
    }
    t.update(kw)
    return t


def _write(tmp_path, name, cfg):
    p = tmp_path / f"{name}.json"
    p.write_text(json.dumps(cfg))
    return str(p)


def _leaves_equal(a, b):
    import jax

    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    assert len(fa) == len(fb) and fa
    return all(np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(fa, fb))


@pytest.mark.slow
def test_four_stage_curriculum_end_to_end(tmp_path):
    saved = tmp_path / "saved"
    ck = lambda name: str(saved / "models" / name / "fixed" / "checkpoint")

    # ---- stage 1: depth bootstrap (reference monorec_depth.json) ---------
    cfg1 = {
        "name": "s1_depth",
        "arch": _arch(pretrain_mode=1, augmentation="depth",
                      pretrain_dropout=0.5),
        "data_loader": _base_loader(stereo=True),
        "optimizer": {"type": "Adam", "args": {"lr": 1e-4, "amsgrad": True}},
        "loss": "depth_loss",
        "metrics": [],
        "trainer": _trainer(saved),
    }
    train_main(["-c", _write(tmp_path, "s1", cfg1), "-o", "stereo"])
    assert Path(ck("s1_depth")).is_dir()

    # ---- stage 2: mask bootstrap (monorec_mask.json) ---------------------
    cfg2 = {
        "name": "s2_mask",
        "arch": _arch(pretrain_mode=2, augmentation="mask"),
        "data_loader": _base_loader(stereo=True, mvobj=2),
        "optimizer": {"type": "Adam", "args": {"lr": 1e-4, "amsgrad": True}},
        "loss": "mask_loss",
        "metrics": [],
        "trainer": _trainer(saved, compute_mono_pred=False,
                            compute_stereo_pred=False),
    }
    train_monorec_main(["-c", _write(tmp_path, "s2", cfg2)])
    assert Path(ck("s2_mask")).is_dir()

    # ---- stage 3: mask refinement (monorec_mask_ref.json), lr=0 ----------
    cfg3 = {
        "name": "s3_mask_ref",
        "arch": _arch(pretrain_mode=0, augmentation="depth",
                      depth_cp_loc=[ck("s1_depth")],
                      mask_cp_loc=[ck("s2_mask")]),
        "data_loader": _base_loader(stereo=True, mvobj=1),
        "optimizer": {"type": "Adam", "args": {"lr": 1e-4, "amsgrad": True}},
        "loss": "mask_refinement_loss",
        "metrics": [],
        "trainer": _trainer(saved, compute_mono_pred=True,
                            compute_stereo_pred=True),
    }
    train_monorec_main(
        ["-c", _write(tmp_path, "s3", cfg3), "-o", "mask_loss", "--lr", "0"]
    )
    assert Path(ck("s3_mask_ref")).is_dir()

    # lr=0 -> the stage-3 checkpoint must hold stage-1's depth_net and
    # stage-2's att params unchanged: the handoff loaded the right subtrees.
    p1 = load_checkpoint(ck("s1_depth"))["params"]
    p2 = load_checkpoint(ck("s2_mask"))["params"]
    p3 = load_checkpoint(ck("s3_mask_ref"))["params"]
    assert _leaves_equal(p3["depth_net"], p1["depth_net"])
    assert _leaves_equal(p3["att"], p2["att"])

    # ---- stage 4: depth refinement (monorec_depth_ref.json) --------------
    cfg4 = {
        "name": "s4_depth_ref",
        "arch": _arch(pretrain_mode=0, augmentation="depth",
                      checkpoint_location=[ck("s3_mask_ref")],
                      freeze_module=["att"]),
        "data_loader": _base_loader(stereo=True, mvobj=1),
        "optimizer": {"type": "Adam", "args": {"lr": 1e-5, "amsgrad": True}},
        "loss": "depth_refinement_loss",
        "metrics": [],
        "trainer": _trainer(saved, compute_mask=True,
                            compute_stereo_pred=True, mult_mask_on_cv=True),
    }
    train_monorec_main(
        ["-c", _write(tmp_path, "s4", cfg4), "-o", "stereo", "stereo_repr"]
    )
    assert Path(ck("s4_depth_ref")).is_dir()

    # The frozen att module must be byte-identical to stage 3's.
    p4 = load_checkpoint(ck("s4_depth_ref"))["params"]
    assert _leaves_equal(p4["att"], p3["att"])
    # ...while the depth net actually trained.
    assert not _leaves_equal(p4["depth_net"], p3["depth_net"])
