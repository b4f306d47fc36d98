"""Integration tests: config system, evaluator, point-cloud export, loggers."""

import json
import struct
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from monorec_tpu.config import ConfigParser
from monorec_tpu.data import DataLoader, SyntheticSweepDataset
from monorec_tpu.eval import Evaluator
from monorec_tpu.export import PLYWriter, export_pointcloud, pointcloud_masks
from monorec_tpu.models import MonoRec, MonoRecConfig
from monorec_tpu.train.loggers import MetricsWriter, make_grid
from monorec_tpu.train.state import create_train_state


def test_config_parser_reference_format(tmp_path):
    cfg = {
        "name": "unit",
        "arch": {
            "type": "MonoRecModel",
            "args": {
                "pretrain_mode": 1,
                "cv_depth_steps": 4,
                "augmentation": "depth",
                "inv_depth_min_max": [0.33, 0.0025],
                "checkpoint_location": [],
            },
        },
        "data_loader": {
            "type": "SyntheticSweepDataloader",
            "args": {
                "length": 8, "batch_size": 2, "target_image_size": [16, 32],
                "shuffle": True, "validation_split": 0.25, "num_workers": 1,
            },
        },
        "optimizer": {"type": "Adam", "args": {"lr": 2e-4, "amsgrad": True}},
        "loss": "depth_loss",
        "metrics": ["abs_rel_sparse_metric"],
        "trainer": {"epochs": 1, "save_dir": str(tmp_path), "alpha": 0.5,
                    "timestamp_replacement": "t0", "tensorboard": False},
    }
    path = tmp_path / "cfg.json"
    path.write_text(json.dumps(cfg))

    parser = ConfigParser(str(path), overrides={"optimizer.args.lr": 5e-4})
    assert parser["optimizer"]["args"]["lr"] == 5e-4
    assert (parser.save_dir / "config.json").exists()
    assert parser.save_dir.name == "t0"

    model, ckpts = parser.build_model()
    assert model.config.pretrain_mode == 1
    assert model.config.cv_depth_steps == 4
    loader = parser.build_data_loader(device_put=False)
    assert loader.batch_size == 2 and loader.split_validation() is not None
    assert parser.build_loss().__name__ == "depth_loss"
    assert parser.build_metrics()[0].__name__ == "abs_rel_sparse_metric"
    parser.build_optimizer(steps_per_epoch=4)


def test_config_precision_policy_round_trip(tmp_path):
    """One top-level "precision" key selects the model dtype knobs AND the
    loss-warp dtype end-to-end; the default is exact f32 everywhere."""
    from monorec_tpu.losses.common import loss_warp_dtype
    from monorec_tpu.precision import precision_policy, set_precision

    base = {
        "name": "prec",
        "arch": {"type": "MonoRecModel", "args": {"cv_depth_steps": 4}},
        "trainer": {"save_dir": str(tmp_path), "timestamp_replacement": "t0"},
    }
    prev = precision_policy()
    try:
        for policy, dtype_name, warp in (
            ("serving", "bfloat16", jnp.bfloat16),
            ("exact", "float32", jnp.float32),
            (None, "float32", jnp.float32),  # default
        ):
            cfg = dict(base)
            if policy is not None:
                cfg["precision"] = policy
            path = tmp_path / f"cfg_{policy}.json"
            path.write_text(json.dumps(cfg))
            parser = ConfigParser(str(path))
            model, _ = parser.build_model()
            assert model.config.cv_warp_dtype == dtype_name
            assert model.config.compute_dtype == dtype_name
            assert loss_warp_dtype() == warp

        # explicit per-knob values in the config win over the policy
        cfg = dict(base)
        cfg["precision"] = "serving"
        cfg["arch"] = {
            "type": "MonoRecModel",
            "args": {"cv_depth_steps": 4, "cv_warp_dtype": "float32"},
        }
        path = tmp_path / "cfg_override.json"
        path.write_text(json.dumps(cfg))
        model, _ = ConfigParser(str(path)).build_model()
        assert model.config.cv_warp_dtype == "float32"
        assert model.config.compute_dtype == "bfloat16"

        with pytest.raises(ValueError):
            set_precision("fast-but-wrong")
    finally:
        set_precision(prev)


def test_set_precision_warns_after_trace_time_consumption():
    """The policy is read at trace time; changing it afterwards silently
    does nothing to already-built jitted steps — so it must warn."""
    import warnings

    from monorec_tpu import precision as prec

    prev = prec.precision_policy()
    prev_consumed = prec._consumed
    try:
        prec._consumed = None
        prec.set_precision("exact")
        prec.loss_warp_dtype()  # a trace consumes the policy
        with pytest.warns(prec.PrecisionPolicyWarning):
            prec.set_precision("serving")

        # Building AFTER the switch is the correct usage: no warning.
        with warnings.catch_warnings():
            warnings.simplefilter("error", prec.PrecisionPolicyWarning)
            prec.apply_to_model_kwargs({})  # consume under "serving"
            prec.set_precision("serving")  # same-name: nothing is stale
        # ...but the same-name call must not erase the consumption memory.
        with pytest.warns(prec.PrecisionPolicyWarning):
            prec.set_precision("exact")

        # expect_rebuild=True: the caller rebuilds everything after the
        # switch (bench/A-B harness pattern), so no warning even though
        # the previous policy was consumed.
        prec.loss_warp_dtype()
        with warnings.catch_warnings():
            warnings.simplefilter("error", prec.PrecisionPolicyWarning)
            prec.set_precision("serving", expect_rebuild=True)
    finally:
        prec._consumed = None
        prec.set_precision(prev)
        prec._consumed = prev_consumed


@pytest.fixture(scope="module")
def tiny_model_setup():
    ds = SyntheticSweepDataset(length=8, target_image_size=(32, 64))
    dl = DataLoader(ds, batch_size=4, shuffle=False, num_workers=1)
    model = MonoRec(MonoRecConfig(cv_depth_steps=4, pretrain_mode=1))
    batch = next(iter(dl))
    state = create_train_state(
        model, batch, jax.random.PRNGKey(0), optax.identity(), train=False
    )
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    return model, variables, dl


def test_evaluator_runs_and_reports(tiny_model_setup, tmp_path):
    model, variables, dl = tiny_model_setup
    ev = Evaluator(
        model, variables, [],
        {"evaluater": {"max_distance": 80, "median_scaling": False}},
        dl, run_dir=str(tmp_path),
    )
    from monorec_tpu.metrics import get_metric

    ev2 = Evaluator(
        model, variables,
        [get_metric("abs_rel_sparse_metric"), get_metric("a1_sparse_metric")],
        {"evaluater": {"max_distance": 80}}, dl, run_dir=str(tmp_path),
    )
    log = ev2.eval()
    assert np.isfinite(log["abs_rel_sparse_metric"])
    assert 0.0 <= log["a1_sparse_metric"] <= 1.0
    out = ev2.save_results(log, {"note": "unit"})
    assert json.loads(Path(out).read_text())["note"] == "unit"


def test_pointcloud_export_writes_valid_ply(tiny_model_setup, tmp_path):
    model, variables, dl = tiny_model_setup
    path = export_pointcloud(
        model, variables, dl, tmp_path / "pc.ply",
        use_mask=True, min_d=1.0, max_d=100.0, dropout=0.0, progress=False,
    )
    raw = Path(path).read_bytes()
    header_end = raw.index(b"end_header\n") + len(b"end_header\n")
    header = raw[:header_end].decode("ascii")
    assert header.startswith("ply\nformat binary_little_endian 1.0")
    n = int([l for l in header.splitlines() if "element vertex" in l][0].split()[-1])
    body = raw[header_end:]
    assert len(body) == n * 6 * 4
    if n:
        x, y, z, r, g, b = struct.unpack("<6f", body[:24])
        assert all(np.isfinite(v) for v in (x, y, z))
        assert 0 <= r <= 255 and 0 <= g <= 255 and 0 <= b <= 255


def test_pointcloud_masks_dilation_veto():
    cv_mask = jnp.zeros((1, 64, 128, 1))
    cv_mask = cv_mask.at[0, 32, 64, 0].set(1.0)
    keep = np.asarray(pointcloud_masks(cv_mask))[0, :, :, 0]
    # a 33x33 neighborhood around the hit is vetoed
    assert keep[32, 64] == 0 and keep[32, 64 + 16] == 0
    assert keep[32, 64 + 17] == 1 and keep[0, 0] == 1


def test_ply_writer_depth_range_and_roi(tmp_path):
    w = PLYWriter(min_d=2.0, max_d=10.0, roi=(2, 6, 2, 6), dropout=0.0)
    inv_depth = np.full((8, 8), 0.2, np.float32)  # 5 m everywhere
    inv_depth[3, 3] = 1.0  # 1 m -> below min_d, dropped
    img = np.zeros((8, 8, 3), np.float32)
    k = np.eye(4, dtype=np.float32) * 1.0
    k[0, 0] = k[1, 1] = 4.0
    k[0, 2] = k[1, 2] = 3.5
    w.add_depthmap(inv_depth, img, k, np.eye(4, dtype=np.float32))
    n = len(w.data) // 6
    assert n == 15  # 4x4 ROI minus the too-close pixel


def test_metrics_writer_jsonl(tmp_path):
    mw = MetricsWriter(tmp_path, enable_tensorboard=False)
    mw.set_step(0)
    mw.add_scalar("loss", 1.5)
    mw.set_step(1, "valid")
    mw.add_scalar("loss", 1.0)
    mw.close()
    lines = [json.loads(l) for l in (tmp_path / "metrics.jsonl").read_text().splitlines()]
    tags = {l["tag"] for l in lines}
    assert "loss/train" in tags and "loss/valid" in tags


def test_make_grid_shapes():
    imgs = np.random.default_rng(0).uniform(0, 1, (3, 4, 6, 3)).astype(np.float32)
    grid = make_grid(imgs, nrow=2)
    assert grid.shape == (8, 12, 3)
    assert grid.min() >= 0 and grid.max() <= 1


def test_all_shipped_configs_build():
    """Every config in configs/ parses, its arch block builds a
    MonoRecConfig, its loss name resolves, its metrics exist, and its
    dataloader type + optimizer/scheduler types are known — catching config
    typos without needing the datasets on disk."""
    import json
    from pathlib import Path

    from monorec_tpu.config.parser import (
        _DATALOADER_TO_DATASET,
        build_model_config,
    )
    from monorec_tpu.losses import LOSSES
    from monorec_tpu.metrics import get_metric
    from monorec_tpu.train.state import make_optimizer

    root = Path(__file__).resolve().parents[1] / "configs"
    files = sorted(root.rglob("*.json"))
    assert len(files) >= 9
    for f in files:
        cfg = json.loads(f.read_text())
        archs = [cfg["arch"]] if "arch" in cfg else cfg.get("models", [])
        assert archs, f
        for a in archs:
            mc, ckpts = build_model_config(a.get("args", {}))
            assert mc.cv_depth_steps > 0
        # pointcloud configs use the reference's "data_set" key, naming the
        # dataset class directly; loader configs name *Dataloader types.
        block = cfg.get("data_loader") or cfg.get("data_set")
        assert block is not None, f
        from monorec_tpu import data as data_mod

        data_mod._register_extra()
        name = _DATALOADER_TO_DATASET.get(block["type"], block["type"])
        assert name in data_mod.DATASETS, (f, block["type"])
        if "loss" in cfg:
            assert cfg["loss"] in LOSSES, (f, cfg["loss"])
        for m in cfg.get("metrics", []):
            get_metric(m)
        if "optimizer" in cfg:
            make_optimizer(cfg["optimizer"], cfg.get("lr_scheduler"), 10)


def test_build_model_config_compute_dtype():
    """The mixed-precision knob round-trips from a reference-style arch
    args dict into MonoRecConfig."""
    from monorec_tpu.config.parser import build_model_config

    mc, _ = build_model_config(
        {"cv_depth_steps": 8, "compute_dtype": "bfloat16",
         "cv_warp_dtype": "bfloat16"}
    )
    assert mc.compute_dtype == "bfloat16"
    assert mc.cv_warp_dtype == "bfloat16"
    mc, _ = build_model_config({"cv_depth_steps": 8})
    assert mc.compute_dtype == "float32"
