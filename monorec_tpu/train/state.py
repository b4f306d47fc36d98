"""Train state + optimizer/schedule factories.

Reflection-style construction from JSON configs (same shapes as the
reference's ``{"type": "Adam", "args": {...}}`` / ``{"type": "StepLR", ...}``
blocks) mapped onto optax. Adam uses amsgrad as the reference configs do.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax
import jax
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
    """Map reference lr_scheduler configs to optax schedules.

    ``StepLR(step_size, gamma)`` -> piecewise exponential per epoch.
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
    raise ValueError(f"unsupported lr scheduler '{kind}'")


def make_optimizer(
    optimizer_cfg: Optional[Dict] = None,
    scheduler_cfg: Optional[Dict] = None,
    steps_per_epoch: int = 1000,
) -> optax.GradientTransformation:
    cfg = optimizer_cfg or {"type": "Adam", "args": {"lr": 1e-4}}
    kind = cfg.get("type", "Adam")
    args = dict(cfg.get("args", {}))
    lr = args.pop("lr", 1e-4)
    schedule = make_schedule(lr, scheduler_cfg, steps_per_epoch)

    if kind == "Adam":
        amsgrad = args.pop("amsgrad", False)
        weight_decay = args.pop("weight_decay", 0.0)
        betas = args.pop("betas", (0.9, 0.999))
        eps = args.pop("eps", 1e-8)
        if amsgrad:
            opt = optax.amsgrad(schedule, b1=betas[0], b2=betas[1], eps=eps)
        else:
            opt = optax.adam(schedule, b1=betas[0], b2=betas[1], eps=eps)
        if weight_decay:
            opt = optax.chain(optax.add_decayed_weights(weight_decay), opt)
        return opt
    if kind == "SGD":
        return optax.sgd(schedule, momentum=args.pop("momentum", 0.0))
    raise ValueError(f"unsupported optimizer '{kind}'")


def create_train_state(
    model, batch, rng: jax.Array, tx: optax.GradientTransformation, train: bool = True
) -> TrainState:
    rngs = {
        "params": rng,
        "dropout": jax.random.fold_in(rng, 1),
        "augment": jax.random.fold_in(rng, 2),
    }
    variables = model.init(rngs, batch, train)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=0,
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
    )
