"""Point-cloud export entry point (reference ``create_pointcloud.py``).

Usage: python -m monorec_tpu.cli.create_pointcloud -c configs/test/pointcloud_monorec.json
"""

from __future__ import annotations

from pathlib import Path


def main(argv=None):
    import optax

    from monorec_tpu.cli.common import parse_config, seed_everything, standard_parser
    from monorec_tpu.config.parser import build_dataset
    from monorec_tpu.data import DataLoader, DatasetWrapper
    from monorec_tpu.export import export_pointcloud
    from monorec_tpu.train.checkpoints import load_submodule_params
    from monorec_tpu.train.state import create_train_state

    parser = standard_parser("monorec_tpu point-cloud export")
    args = parser.parse_args(argv)
    config = parse_config(args)
    rng = seed_everything(0)

    cfg = config.config
    output_dir = Path(cfg.get("output_dir", "saved"))
    file_name = cfg.get("file_name", "pc.ply")
    use_mask = cfg.get("use_mask", True)
    roi = cfg.get("roi")
    max_d = cfg.get("max_d", 30)
    min_d = cfg.get("min_d", 3)
    start = cfg.get("start", 0)
    end = cfg.get("end", -1)

    ds_block = cfg["data_set"]
    dataset = DatasetWrapper(
        build_dataset(ds_block["type"], dict(ds_block["args"])), start=start, end=end
    )
    loader = DataLoader(dataset, batch_size=1, shuffle=False, drop_last=False)

    model, ckpts = config.build_model()
    batch = next(iter(loader))
    state = create_train_state(model, batch, rng, optax.identity(), train=False)
    params = state.params
    locs = ckpts.get("checkpoint_location")
    if locs:
        params = load_submodule_params(
            params, locs if isinstance(locs, list) else [locs], None
        )
    variables = {"params": params, "batch_stats": state.batch_stats}

    out = export_pointcloud(
        model, variables, loader, output_dir / file_name,
        use_mask=use_mask, roi=roi, min_d=min_d, max_d=max_d,
    )
    print(f"point cloud written to {out}")


if __name__ == "__main__":
    main()
