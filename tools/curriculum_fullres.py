"""Drive the full 4-stage curriculum at FULL resolution on the real chip.

``tests/test_curriculum.py`` proves the staged CLI handoff at 32x64 on CPU;
this tool runs the same 4-stage protocol (depth bootstrap -> mask bootstrap
-> mask refinement -> depth refinement, reference README.md:109-113 +
configs/train/monorec/*.json) at the real operating point — 256x512,
batch 8, D=32, len_epoch-truncated epochs — through the REAL CLIs
(``cli/train.py`` for stage 1, ``cli/train_monorec.py`` for stages 2-4)
with orbax checkpoint handoff between stages. Surfaces full-res
compile/VMEM issues the small-shape test cannot.

Data: the synthetic sweep dataset (no real KITTI training set exists in
this environment; the shapes/protocol, not the data, are what full-res
execution validates). Logs per-stage wall and steps/sec; run with
``python tools/curriculum_fullres.py [workdir]`` and commit the log.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(ROOT, ".jax_tpu_cache")
)

H, W, D, B, F = 256, 512, 32, 8, 2
LEN_EPOCH = 12  # steps per stage: enough for steady-state step timing


def _loader(stereo, mvobj):
    return {
        "type": "SyntheticSweepDataloader",
        "args": {
            "length": 96, "batch_size": B, "frame_count": F,
            "target_image_size": [H, W], "shuffle": True,
            "validation_split": 0.0, "num_workers": 2,
            "return_stereo": stereo, "return_mvobj_mask": mvobj,
        },
    }


def _arch(**kw):
    args = {
        "cv_depth_steps": D, "use_mono": True, "use_stereo": False,
        "inv_depth_min_max": [0.33, 0.0025],
    }
    args.update(kw)
    return {"type": "MonoRecModel", "args": args}


def _trainer(saved, **kw):
    t = {
        "epochs": 1, "len_epoch": LEN_EPOCH, "save_dir": saved,
        "save_period": 1, "verbosity": 2, "log_step": 4, "alpha": 0.5,
        "max_distance": 80, "timestamp_replacement": "fullres",
        "tensorboard": False,
    }
    t.update(kw)
    return t


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/monorec_fullres_curriculum"
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir)
    saved = os.path.join(workdir, "saved")
    ck = lambda name: os.path.join(saved, "models", name, "fullres", "checkpoint")

    from monorec_tpu.cli.train import main as train_main
    from monorec_tpu.cli.train_monorec import main as train_monorec_main

    stages = [
        # (name, cli, config, options)
        (
            "s1_depth", train_main,
            {
                "name": "s1_depth", "precision": "serving",
                "arch": _arch(pretrain_mode=1, pretrain_dropout=0.5,
                              augmentation="depth"),
                "data_loader": _loader(stereo=True, mvobj=0),
                "optimizer": {"type": "Adam", "args": {"lr": 1e-4, "amsgrad": True}},
                "loss": "depth_loss",
                "metrics": ["abs_rel_sparse_metric"],
                "trainer": _trainer(saved),
            },
            ["-o", "stereo"],
        ),
        (
            "s2_mask", train_monorec_main,
            {
                "name": "s2_mask", "precision": "serving",
                "arch": _arch(pretrain_mode=2, augmentation="mask"),
                "data_loader": _loader(stereo=True, mvobj=2),
                "optimizer": {"type": "Adam", "args": {"lr": 1e-4, "amsgrad": True}},
                "loss": "mask_loss",
                "metrics": [],
                "trainer": _trainer(saved, compute_mono_pred=False,
                                    compute_stereo_pred=False),
            },
            [],
        ),
        (
            "s3_mask_ref", train_monorec_main,
            {
                "name": "s3_mask_ref", "precision": "serving",
                "arch": _arch(pretrain_mode=0, augmentation="depth",
                              depth_cp_loc=[ck("s1_depth")],
                              mask_cp_loc=[ck("s2_mask")]),
                "data_loader": _loader(stereo=True, mvobj=1),
                "optimizer": {"type": "Adam", "args": {"lr": 1e-4, "amsgrad": True}},
                "loss": "mask_refinement_loss",
                "metrics": [],
                "trainer": _trainer(saved, compute_mono_pred=True,
                                    compute_stereo_pred=True),
            },
            ["-o", "mask_loss"],
        ),
        (
            "s4_depth_ref", train_monorec_main,
            {
                "name": "s4_depth_ref", "precision": "serving",
                "arch": _arch(pretrain_mode=0, augmentation="depth",
                              checkpoint_location=[ck("s3_mask_ref")],
                              freeze_module=["att"]),
                "data_loader": _loader(stereo=True, mvobj=1),
                "optimizer": {"type": "Adam", "args": {"lr": 1e-5, "amsgrad": True}},
                "loss": "depth_refinement_loss",
                "metrics": [],
                "trainer": _trainer(saved, compute_mask=True,
                                    compute_stereo_pred=True,
                                    mult_mask_on_cv=True),
            },
            ["-o", "stereo", "stereo_repr"],
        ),
    ]

    summary = {"operating_point": f"{H}x{W} D={D} B={B} F={F}, serving, "
                                  f"len_epoch={LEN_EPOCH}", "stages": {}}
    for name, cli, cfg, opts in stages:
        cfg_path = os.path.join(workdir, f"{name}.json")
        with open(cfg_path, "w") as f:
            json.dump(cfg, f, indent=1)
        print(f"[curriculum] === {name} ===", flush=True)
        t0 = time.time()
        cli(["-c", cfg_path] + opts)
        wall = time.time() - t0
        assert os.path.isdir(ck(name)), f"{name}: checkpoint missing"
        summary["stages"][name] = {"wall_s": round(wall, 1)}
        print(f"[curriculum] {name} done in {wall:.1f}s, checkpoint ok",
              flush=True)

    print(json.dumps(summary))


if __name__ == "__main__":
    main()
