"""Stage-1 training entry point (reference ``train.py``).

Usage: python -m monorec_tpu.cli.train -c configs/train/monorec/monorec_depth.json [-o stereo]
"""

from __future__ import annotations


def main(argv=None):
    from monorec_tpu.cli.common import (
        first_batch,
        init_state_with_checkpoints,
        parse_config,
        seed_everything,
        standard_parser,
        train_overrides,
    )
    from monorec_tpu.train import Trainer

    parser = train_overrides(standard_parser("monorec_tpu stage-1 training"))
    args = parser.parse_args(argv)
    config = parse_config(args, with_train_overrides=True)
    rng = seed_everything(0)

    data_loader = config.build_data_loader()
    valid_loader = (
        config.build_data_loader("val_data_loader")
        if "val_data_loader" in config
        else data_loader.split_validation()
    )

    model, ckpts = config.build_model()
    loss_fn = config.build_loss()
    metric_fns = config.build_metrics()
    tx = config.build_optimizer(steps_per_epoch=len(data_loader))

    batch = first_batch(data_loader)
    state = init_state_with_checkpoints(model, batch, rng, tx, ckpts)

    trainer = Trainer(
        model, loss_fn, metric_fns, state, config.config, data_loader,
        valid_data_loader=valid_loader, run_dir=str(config.save_dir),
        options=config.options, rng=rng,
    )
    if args.resume:
        trainer.resume(args.resume)
    trainer.train()


if __name__ == "__main__":
    main()
