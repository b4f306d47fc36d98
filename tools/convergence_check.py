"""Serving-policy convergence evidence: exact-f32 vs bf16-serving training.

The "serving" precision policy changes three dtypes (CV warp, U-Net conv
compute, loss-reprojection warp); a 30-step loss-tracking spot check is
thin evidence that training under it converges to the same place. This
tool runs N stage-1 (depth bootstrap) steps on the synthetic sweep
pipeline — same params init, same rng sequence, same batch order — once
under each policy on the real chip, then evaluates abs_rel (f32, same
held-out batches for both) with the final params. Results go to stdout as
one JSON line; PARITY.md records the run.

Usage:  python tools/convergence_check.py [--steps 300] [--batch 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _note(msg):
    print(f"[conv {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def run_policy(policy: str, steps: int, batch_size: int, log_every: int,
               stage: int = 1):
    import jax
    import jax.numpy as jnp

    from monorec_tpu.data import DataLoader, SyntheticSweepDataset
    from monorec_tpu.losses import depth_loss, depth_refinement_loss
    from monorec_tpu.models import MonoRec, MonoRecConfig
    from monorec_tpu.precision import apply_to_model_kwargs, set_precision
    from monorec_tpu.train.state import create_train_state, make_optimizer

    # Everything is rebuilt per policy below; the stale-trace warning
    # does not apply to this pattern.
    set_precision(policy, expect_rebuild=True)

    if stage == 4:
        # Depth refinement: the stereo branch acts as detached pseudo-GT
        # for dynamic pixels (reference ``monorec_loss.py:330-340``) — the
        # configuration where bf16 drift becomes *label* noise, so the
        # policy evidence must cover it (configs/train/monorec/
        # monorec_depth_ref.json: frozen att, mult_mask_on_cv, lr 1e-5,
        # options stereo+stereo_repr).
        model = MonoRec(
            MonoRecConfig(
                cv_depth_steps=32, pretrain_mode=0, augmentation="depth",
                freeze_module=("att",), **apply_to_model_kwargs({}),
            )
        )
    else:
        model = MonoRec(
            MonoRecConfig(
                cv_depth_steps=32, pretrain_mode=1, pretrain_dropout=0.5,
                augmentation="depth", **apply_to_model_kwargs({}),
            )
        )
    ds = SyntheticSweepDataset(
        length=64, target_image_size=(256, 512), frame_count=2,
        return_stereo=True, seed=0,
    )
    dl = DataLoader(ds, batch_size=batch_size, shuffle=True, num_workers=2, seed=7)
    batch0 = next(iter(dl))
    lr = 1e-5 if stage == 4 else 1e-4
    tx = make_optimizer({"type": "Adam", "args": {"lr": lr, "amsgrad": True}})
    state = create_train_state(model, batch0, jax.random.PRNGKey(0), tx)

    import functools

    if stage == 4:
        from monorec_tpu.train import MonoRecTrainer

        class _Loader:
            def __init__(self, b):
                self.batch, self.batch_size = b, batch_size

            def __iter__(self):
                return iter([self.batch])

            def __len__(self):
                return 1

        trainer = MonoRecTrainer(
            model, depth_refinement_loss, [], state,
            {"trainer": {"compute_mono_pred": True, "compute_stereo_pred": True,
                         "compute_mask": True, "mult_mask_on_cv": True,
                         "epochs": 1, "alpha": 0.5, "tensorboard": False}},
            data_loader=_Loader(batch0),
            run_dir=f"/tmp/monorec_conv_stage4_{policy}",
            options=("stereo", "stereo_repr"),
        )
        trainer._build_steps()

        def step(state, batch, rng):
            new_state, loss_dict, _, _ = trainer._train_step(
                state, batch, rng, jnp.float32(0.5)
            )
            return new_state, loss_dict["loss"]

    else:

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(state, batch, rng):
            def losses(params):
                out = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    batch, True,
                    rngs={
                        "dropout": jax.random.fold_in(rng, 0),
                        "augment": jax.random.fold_in(rng, 1),
                    },
                )
                return depth_loss({**batch, **out}, 0.5, None, ("stereo",))["loss"]

            loss, grads = jax.value_and_grad(losses)(state.params)
            return state.apply_gradients(grads), loss

    curve = []
    rng = jax.random.PRNGKey(1)
    it = iter(dl)
    t0 = time.time()
    for i in range(steps):
        try:
            batch = next(it)
        except StopIteration:
            it = iter(dl)
            batch = next(it)
        rng, srng = jax.random.split(rng)
        state, loss = step(state, batch, srng)
        if i % log_every == 0 or i == steps - 1:
            curve.append((i, float(loss)))
            _note(f"{policy} step {i}: loss {float(loss):.6f}")
    _note(f"{policy}: {steps} steps in {time.time() - t0:.1f}s")

    # Final-params eval: abs_rel on held-out synthetic batches, always f32
    # metrics; the model forward stays under its training policy (that IS
    # the configuration whose end quality is in question).
    from monorec_tpu.metrics import get_metric

    abs_rel = get_metric("abs_rel_sparse_metric")
    eval_ds = SyntheticSweepDataset(
        length=16, target_image_size=(256, 512), frame_count=2,
        return_stereo=True, seed=99,
    )
    eval_dl = DataLoader(eval_ds, batch_size=batch_size, shuffle=False, num_workers=2)

    @jax.jit
    def eval_step(params, batch_stats, batch):
        out = model.apply({"params": params, "batch_stats": batch_stats}, batch, False)
        return abs_rel({**batch, **out}, None, 80.0)

    vals = [
        float(eval_step(state.params, state.batch_stats, b)) for b in eval_dl
    ]
    return {
        "curve": curve,
        "final_loss": curve[-1][1],
        "abs_rel": sum(vals) / len(vals),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--log-every", type=int, default=25)
    ap.add_argument("--stage", type=int, default=1, choices=(1, 4))
    args = ap.parse_args()

    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_tpu_cache"),
    )

    res = {}
    for policy in ("exact", "serving"):
        _note(f"=== policy {policy} (stage {args.stage}) ===")
        res[policy] = run_policy(
            policy, args.steps, args.batch, args.log_every, args.stage
        )

    e, s = res["exact"], res["serving"]
    out = {
        "stage": args.stage,
        "steps": args.steps,
        "batch": args.batch,
        "final_loss_exact": round(e["final_loss"], 6),
        "final_loss_serving": round(s["final_loss"], 6),
        "final_loss_rel_gap": round(
            abs(e["final_loss"] - s["final_loss"]) / max(abs(e["final_loss"]), 1e-12), 6
        ),
        "abs_rel_exact": round(e["abs_rel"], 6),
        "abs_rel_serving": round(s["abs_rel"], 6),
        "abs_rel_rel_delta": round(
            abs(e["abs_rel"] - s["abs_rel"]) / max(abs(e["abs_rel"]), 1e-12), 6
        ),
        "curve_exact": e["curve"],
        "curve_serving": s["curve"],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
