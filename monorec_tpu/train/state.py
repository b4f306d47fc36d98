"""Train state + optimizer/schedule factories.

Reflection-style construction from JSON configs (same shapes as the
reference's ``{"type": "Adam", "args": {...}}`` / ``{"type": "StepLR", ...}``
blocks) mapped onto optax. Adam uses amsgrad as the reference configs do.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax
import jax
import numpy as np
import optax


@flax.struct.dataclass
class TrainState:
    step: int
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt
        )


def make_schedule(
    lr: float, scheduler_cfg: Optional[Dict], steps_per_epoch: int
) -> optax.Schedule:
    """Map reference (torch.optim.lr_scheduler-style) configs to optax
    schedules; the reference resolves these by reflection
    (``utils/parse_config.py:72-89``), so the whole commonly-used surface
    maps here. Epoch-granular torch schedulers become per-step schedules
    with epoch-sized staircase transitions.
    """
    if not scheduler_cfg:
        return optax.constant_schedule(lr)
    kind = scheduler_cfg.get("type", "StepLR")
    args = scheduler_cfg.get("args", {})
    if kind == "StepLR":
        step_size = args.get("step_size", 30)
        gamma = args.get("gamma", 0.1)
        return optax.exponential_decay(
            init_value=lr,
            transition_steps=step_size * steps_per_epoch,
            decay_rate=gamma,
            staircase=True,
        )
    if kind == "ExponentialLR":
        return optax.exponential_decay(
            init_value=lr,
            transition_steps=steps_per_epoch,
            decay_rate=args.get("gamma", 0.95),
            staircase=True,
        )
    if kind == "MultiStepLR":
        gamma = args.get("gamma", 0.1)
        milestones = sorted(args.get("milestones", []))
        return optax.piecewise_constant_schedule(
            init_value=lr,
            boundaries_and_scales={
                int(m) * steps_per_epoch: gamma for m in milestones
            },
        )
    if kind == "CosineAnnealingLR":
        t_max = args.get("T_max", 50)
        eta_min = args.get("eta_min", 0.0)
        return optax.cosine_decay_schedule(
            init_value=lr,
            decay_steps=int(t_max) * steps_per_epoch,
            alpha=eta_min / lr if lr else 0.0,
        )
    if kind == "LinearLR":
        start = args.get("start_factor", 1.0 / 3.0)
        end = args.get("end_factor", 1.0)
        total = args.get("total_iters", 5)
        return optax.linear_schedule(
            init_value=lr * start,
            end_value=lr * end,
            transition_steps=int(total) * steps_per_epoch,
        )
    if kind == "ConstantLR":
        return optax.constant_schedule(lr)
    if kind == "OneCycleLR":
        total = args.get("total_steps", steps_per_epoch * 10)
        return optax.cosine_onecycle_schedule(
            transition_steps=int(total),
            peak_value=args.get("max_lr", lr),
            pct_start=args.get("pct_start", 0.3),
            div_factor=args.get("div_factor", 25.0),
            final_div_factor=args.get("final_div_factor", 1e4),
        )
    raise ValueError(
        f"unsupported lr scheduler '{kind}' (supported: StepLR, "
        "ExponentialLR, MultiStepLR, CosineAnnealingLR, LinearLR, "
        "ConstantLR, OneCycleLR)"
    )


def make_optimizer(
    optimizer_cfg: Optional[Dict] = None,
    scheduler_cfg: Optional[Dict] = None,
    steps_per_epoch: int = 1000,
) -> optax.GradientTransformation:
    """Map reference (torch.optim-style) optimizer configs to optax.

    The reference instantiates ``getattr(torch.optim, type)(**args)`` by
    reflection; this maps the same names/args onto optax transforms.
    """
    cfg = optimizer_cfg or {"type": "Adam", "args": {"lr": 1e-4}}
    kind = cfg.get("type", "Adam")
    args = dict(cfg.get("args", {}))
    lr = args.pop("lr", 1e-4)
    schedule = make_schedule(lr, scheduler_cfg, steps_per_epoch)
    # None = absent; an explicit 0.0 must be honored (torch AdamW defaults
    # to 0.01 only when the arg is not given).
    weight_decay = args.pop("weight_decay", None)

    def _betas():
        betas = args.pop("betas", (0.9, 0.999))
        return betas[0], betas[1], args.pop("eps", 1e-8)

    if kind in ("Adam", "AdamW"):
        amsgrad = args.pop("amsgrad", False)
        b1, b2, eps = _betas()
        if kind == "AdamW":
            opt = optax.adamw(
                schedule, b1=b1, b2=b2, eps=eps,
                weight_decay=0.01 if weight_decay is None else weight_decay,
            )
            weight_decay = None
        elif amsgrad:
            opt = optax.amsgrad(schedule, b1=b1, b2=b2, eps=eps)
        else:
            opt = optax.adam(schedule, b1=b1, b2=b2, eps=eps)
    elif kind == "SGD":
        opt = optax.sgd(
            schedule,
            momentum=args.pop("momentum", 0.0) or None,
            nesterov=args.pop("nesterov", False),
        )
    elif kind == "RMSprop":
        opt = optax.rmsprop(
            schedule,
            decay=args.pop("alpha", 0.99),
            eps=args.pop("eps", 1e-8),
            momentum=args.pop("momentum", 0.0),
            centered=args.pop("centered", False),
        )
    elif kind == "Adagrad":
        opt = optax.adagrad(
            schedule,
            initial_accumulator_value=args.pop("initial_accumulator_value", 0.0),
            eps=args.pop("eps", 1e-10),
        )
    elif kind == "Adadelta":
        opt = optax.adadelta(
            schedule, rho=args.pop("rho", 0.9), eps=args.pop("eps", 1e-6)
        )
    elif kind == "Adamax":
        b1, b2, eps = _betas()
        opt = optax.adamax(schedule, b1=b1, b2=b2, eps=eps)
    elif kind == "RAdam":
        b1, b2, eps = _betas()
        opt = optax.radam(schedule, b1=b1, b2=b2, eps=eps)
    elif kind == "NAdam":
        b1, b2, eps = _betas()
        opt = optax.nadam(schedule, b1=b1, b2=b2, eps=eps)
    else:
        raise ValueError(
            f"unsupported optimizer '{kind}' (supported: Adam, AdamW, SGD, "
            "RMSprop, Adagrad, Adadelta, Adamax, RAdam, NAdam)"
        )
    if weight_decay:
        opt = optax.chain(optax.add_decayed_weights(weight_decay), opt)
    return opt


def create_train_state(
    model, batch, rng: jax.Array, tx: optax.GradientTransformation, train: bool = True
) -> TrainState:
    rngs = {
        "params": rng,
        "dropout": jax.random.fold_in(rng, 1),
        "augment": jax.random.fold_in(rng, 2),
    }
    # Init as ONE compiled program: eager init dispatches hundreds of ops,
    # and on a remote-tunnel backend (axon) each is a network round trip —
    # measured ~7 minutes for the full model at 256x512 vs seconds jitted.
    # Non-NUMERIC metadata leaves (e.g. a dataset's "sequence" strings,
    # which collate() np.stacks into a '<U..' ndarray — it has .shape but
    # can't be traced) aren't read by the model; drop them.
    def _traceable(v):
        if isinstance(v, (bool, int, float)):
            return True
        dt = getattr(v, "dtype", None)
        return dt is not None and (
            np.issubdtype(dt, np.number) or np.issubdtype(dt, np.bool_)
        )

    array_batch = {k: v for k, v in batch.items() if _traceable(v)}
    variables = jax.jit(lambda r, b: model.init(r, b, train))(rngs, array_batch)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=0,
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
    )
