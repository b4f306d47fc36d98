"""Evaluation entry point (reference ``evaluate.py``).

Usage: python -m monorec_tpu.cli.evaluate -c configs/evaluate/eval_monorec.json
Writes ``results.json`` with model/dataset attributes + metrics.
"""

from __future__ import annotations

import json


def main(argv=None):
    import jax

    from monorec_tpu.cli.common import parse_config, seed_everything, standard_parser
    from monorec_tpu.eval import Evaluator
    from monorec_tpu.train.checkpoints import load_submodule_params
    from monorec_tpu.train.state import create_train_state
    import optax

    parser = standard_parser("monorec_tpu evaluation")
    args = parser.parse_args(argv)
    config = parse_config(args)
    rng = seed_everything(0)

    data_loader = config.build_data_loader()
    metric_fns = config.build_metrics()

    model_specs = config.build_models()
    if not model_specs:
        model, ckpts = config.build_model()
        model_specs = [(model, ckpts)]

    batch = next(iter(data_loader))
    results = []
    for i, (model, ckpts) in enumerate(model_specs):
        state = create_train_state(model, batch, rng, optax.identity(), train=False)
        params = state.params
        locs = ckpts.get("checkpoint_location")
        if locs:
            params = load_submodule_params(
                params, locs if isinstance(locs, list) else [locs], None
            )
        variables = {"params": params, "batch_stats": state.batch_stats}

        evaluator = Evaluator(
            model, variables, metric_fns, config.config, data_loader,
            run_dir=str(config.log_dir),
        )
        log = evaluator.eval(i)
        extra = {
            "model": {"config": str(model.config)},
            "dataset": {
                "type": config["data_loader"]["type"],
                "args": config["data_loader"]["args"],
            },
        }
        path = evaluator.save_results(log, extra, name=f"results_{i}.json")
        print(json.dumps({m.__name__: log[m.__name__] for m in metric_fns}, indent=2))
        results.append(str(path))
    print("results written:", results)


if __name__ == "__main__":
    main()
