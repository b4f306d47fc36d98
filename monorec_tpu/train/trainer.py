"""Stage-1 trainer: one jitted, mesh-sharded train step + epoch loop.

The TPU-native replacement for the reference ``base/base_trainer.py`` +
``trainer/trainer.py``: the forward, loss, backward and optimizer update are
one compiled XLA program; the global batch is sharded over the mesh's data
axis and XLA all-reduces the gradients over ICI (the functional analog of
both DataParallel paths, including the in-replica ``LossWrapper`` backward).

Epoch mechanics preserved from the reference: iteration-based epochs
(``len_epoch``), NaN-metric batch invalidation, monitor-metric best tracking
with early stopping, per-epoch value faders, periodic checkpointing, and
image/scalar logging.
"""

from __future__ import annotations

import math
from pathlib import Path
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from monorec_tpu.parallel import make_mesh, shard_batch
from monorec_tpu.train import checkpoints as ckpt
from monorec_tpu.train.loggers import MetricsWriter, make_grid, setup_logging
from monorec_tpu.train.state import TrainState
from monorec_tpu.utils import ValueFader, operator_on_dict


def apply_gradients_guarded(state: TrainState, grads, skip_nonfinite: bool):
    """``state.apply_gradients``, optionally skipping non-finite updates.

    Gates on GRADIENT finiteness, not the loss value: the refinement
    losses can report a NaN loss through detached (zero-gradient) terms on
    degenerate batches — reference ``mask_mean`` yields NaN on an
    all-invalid reduction (``utils/util.py:110-118``) and
    ``depth_refinement_loss`` feeds detached sdl terms into the reported
    total (``monorec_loss.py:334-340``) — while the gradients stay finite.
    Such steps must still apply, exactly as the reference's ``backward()``
    would. A non-finite gradient, by contrast, would permanently poison
    the optimizer state (the reference has no protection against this);
    with the guard the whole update becomes a no-op (params, opt_state
    and step keep their old values) and the step reports
    ``skipped_nonfinite`` = 1.0.

    Returns ``(new_state, skipped)``; ``skipped`` is None when the guard
    is off (zero-cost path) else a 0/1 float scalar.
    """
    new_state = state.apply_gradients(grads)
    if not skip_nonfinite:
        return new_state, None
    good = jnp.bool_(True)
    for g in jax.tree_util.tree_leaves(grads):
        good = good & jnp.all(jnp.isfinite(g))
    guarded = jax.tree_util.tree_map(
        lambda new, old: jnp.where(good, new, old), new_state, state
    )
    return guarded, (~good).astype(jnp.float32)


class Trainer:
    """Generic trainer: full model forward + loss (stage 1 / depth bootstrap)."""

    def __init__(
        self,
        model,
        loss_fn: Callable,
        metric_fns: Sequence[Callable],
        state: TrainState,
        config: Dict,
        data_loader,
        valid_data_loader=None,
        run_dir: str = "saved/run",
        options: Sequence[str] = (),
        mesh=None,
        rng: Optional[jax.Array] = None,
    ):
        self.model = model
        self.loss_fn = loss_fn
        self.metric_fns = list(metric_fns)
        self.state = state
        self.config = config
        self.data_loader = data_loader
        self.valid_data_loader = valid_data_loader
        self.options = tuple(options)
        self.mesh = mesh if mesh is not None else make_mesh()
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)
        self.optimizer_type = config.get("optimizer", {}).get("type", "Adam")

        # Let the loader's prefetch thread device-put each batch directly
        # with the trainer's sharding, so the batch crosses PCIe exactly once
        # (otherwise the loader puts unsharded and shard_batch re-puts).
        for dl in (data_loader, valid_data_loader):
            if dl is not None and hasattr(dl, "mesh"):
                dl.mesh = self.mesh

        tcfg = config.get("trainer", {})
        self.epochs = tcfg.get("epochs", 1)
        self.save_period = tcfg.get("save_period", 1)
        self.len_epoch = tcfg.get("len_epoch") or len(data_loader)
        self.log_step = tcfg.get("log_step", int(math.sqrt(max(1, data_loader.batch_size))))
        self.val_log_step = tcfg.get("val_step", 1)
        self.roi = tcfg.get("roi")
        self.roi_train = tcfg.get("roi_train", self.roi)
        self.alpha = tcfg.get("alpha", None)
        self.max_distance = tcfg.get("max_distance", None)
        self.monitor = tcfg.get("monitor", "off")
        self.early_stop = tcfg.get("early_stop", math.inf)
        self.save_multiple = tcfg.get("save_multiple", False)
        self.invert_output_images = tcfg.get("invert_output_images", True)
        # On-device color jitter (set the dataset's use_color_augmentation
        # to false when enabling this — the jitter then runs inside the
        # jitted train step instead of on the host loader thread).
        self.color_aug_on_device = tcfg.get("color_aug_on_device", False)
        # Opt-in: turn steps with non-finite gradients into no-ops instead
        # of letting them poison the optimizer state (see
        # apply_gradients_guarded). Off by default for reference parity.
        self.skip_nonfinite_updates = tcfg.get("skip_nonfinite_updates", False)
        self.value_faders = {
            k: ValueFader(v[0], v[1]) for k, v in tcfg.get("value_faders", {}).items()
        }

        self.run_dir = Path(run_dir)
        self.run_dir.mkdir(parents=True, exist_ok=True)
        self.logger = setup_logging(self.run_dir, verbosity=tcfg.get("verbosity", 2))
        self.writer = MetricsWriter(
            self.run_dir / "tb", enable_tensorboard=tcfg.get("tensorboard", True)
        )

        if self.monitor == "off":
            self.mnt_mode = "off"
            self.mnt_best = 0.0
        else:
            self.mnt_mode, self.mnt_metric = self.monitor.split()
            self.mnt_best = math.inf if self.mnt_mode == "min" else -math.inf

        # Per-module latency surface (the reference's cv_module_time analog,
        # model/monorec/monorec_model.py:151,276-278). Inside one fused jitted
        # step module boundaries don't exist, so on log steps the submodules
        # are run as separate compiled programs and fenced with
        # block_until_ready; reported in ms via TB + the log line.
        self.module_timing = tcfg.get("module_timing", False)
        self._timed_fns = None

        self.start_epoch = 1
        self._train_step = None
        self._valid_step = None

    # ----- compiled steps -------------------------------------------------

    def _build_steps(self):
        model, loss_fn = self.model, self.loss_fn
        options, roi_train = self.options, self.roi_train
        metric_fns, roi, max_distance = self.metric_fns, self.roi, self.max_distance

        def compute_metrics(data):
            if not metric_fns:
                return jnp.zeros((0,))
            return jnp.stack([m(data, roi, max_distance) for m in metric_fns])

        color_aug = self.color_aug_on_device
        skip_nf = self.skip_nonfinite_updates

        def train_step(state: TrainState, batch: Dict, rng, alpha):
            if color_aug:
                from monorec_tpu.models.augmentation import jitter_image_keys

                batch = jitter_image_keys(batch, jax.random.fold_in(rng, 2))

            def losses(params):
                out = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    batch,
                    True,
                    rngs={
                        "dropout": jax.random.fold_in(rng, 0),
                        "augment": jax.random.fold_in(rng, 1),
                    },
                )
                data = {**batch, **out}
                loss_dict = loss_fn(data, alpha, roi_train, options)
                return loss_dict["loss"], (loss_dict, data)

            grads, (loss_dict, data) = jax.grad(losses, has_aux=True)(state.params)
            new_state, skipped = apply_gradients_guarded(state, grads, skip_nf)
            metrics = compute_metrics(data)
            if "cv_uncovered" in data:
                loss_dict = dict(loss_dict, cv_uncovered=jnp.sum(data["cv_uncovered"]))
            if skipped is not None:
                loss_dict = dict(loss_dict, skipped_nonfinite=skipped)
            viz = {
                "result": data["result"],
                "mask": data.get("mask", None),
            }
            return new_state, loss_dict, metrics, viz

        def valid_step(state: TrainState, batch: Dict, alpha):
            out = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                batch,
                False,
            )
            data = {**batch, **out}
            loss_dict = loss_fn(data, alpha, roi_train, options)
            metrics = compute_metrics(data)
            viz = {"result": data["result"], "mask": data.get("mask", None)}
            return loss_dict, metrics, viz

        self._train_step = jax.jit(train_step, donate_argnums=(0,))
        self._valid_step = jax.jit(valid_step)

    def _module_times(self, batch: Dict) -> Dict[str, float]:
        """Wall-clock the CV / ResNet / mask / depth submodules (ms) as
        separate compiled programs on the current params. Steady-state: each
        fn runs once un-timed first (covers compile + warmup)."""
        import time as _time

        model = self.model
        cfg = model.config
        if self._timed_fns is None:
            fns = {
                "cv": None
                if cfg.no_cv
                else jax.jit(lambda v, b: model.apply(v, b, method="cost_volume")),
                "resnet": jax.jit(
                    lambda v, kf: model.apply(v, kf, method="features")
                ),
                "mask": jax.jit(
                    lambda v, sfcv, feats: model.apply(v, sfcv, feats, method="mask")
                )
                if cfg.has_mask_module and not cfg.simple_mask and not cfg.no_cv
                else None,
                "depth": jax.jit(
                    lambda v, cv, kf, feats: model.apply(
                        v, cv, kf, feats, method="depth"
                    )
                )
                if cfg.has_depth_module and not cfg.no_cv
                else None,
            }
            self._timed_fns = fns
        fns = self._timed_fns

        variables = {
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
        }

        def timed(fn, *args):
            jax.block_until_ready(fn(variables, *args))  # compile + warm
            t0 = _time.perf_counter()
            out = fn(variables, *args)
            jax.block_until_ready(out)
            return out, (_time.perf_counter() - t0) * 1000.0

        times = {}
        kf = batch["keyframe"]
        cv = sfcv = None
        if fns["cv"] is not None:
            (cv, sfcv), times["cv_module_time"] = timed(fns["cv"], batch)
        feats, times["resnet_module_time"] = timed(fns["resnet"], kf)
        if fns["mask"] is not None:
            _, times["mask_module_time"] = timed(fns["mask"], sfcv, feats)
        if fns["depth"] is not None:
            _, times["depth_module_time"] = timed(fns["depth"], cv, kf, feats)
        return times

    # ----- epoch loops ------------------------------------------------------

    def _fade_alpha(self, epoch: int):
        if "alpha" in self.value_faders:
            return jnp.float32(self.value_faders["alpha"].get_value(epoch))
        return jnp.float32(self.alpha if self.alpha is not None else 0.5)

    def _log_images(self, batch, viz):
        img_count = min(batch["keyframe"].shape[0], 8)
        result = np.asarray(viz["result"][:img_count])
        if self.invert_output_images:
            result = np.clip(
                1.0 / np.where(result == 0, np.inf, result), 0, 100
            )
            result = result / max(result.max() * 2 / 3, 1e-8)
        if viz.get("mask") is not None:
            mask = np.asarray(viz["mask"][:img_count])
            result = np.concatenate([result, mask], axis=1)
        self.writer.add_image(
            "input", make_grid(np.asarray(batch["keyframe"][:img_count]) + 0.5, 2, True)
        )
        self.writer.add_image("output", make_grid(result, 2, True))
        gt = np.asarray(batch["target"][:img_count])
        gt = np.clip(np.where(gt == 0, 0, 1 / np.where(gt == 0, 1, gt)), 0, 100)
        self.writer.add_image("ground_truth", make_grid(gt, 2, True))

    def _train_epoch(self, epoch: int) -> Dict:
        if self._train_step is None:
            self._build_steps()
        alpha = self._fade_alpha(epoch)

        total_loss = 0.0
        total_loss_dict: Dict = {}
        total_metrics = np.zeros(len(self.metric_fns))
        total_valid = np.zeros(len(self.metric_fns))

        it = iter(self.data_loader)
        for batch_idx in range(self.len_epoch):
            try:
                batch = next(it)
            except StopIteration:
                it = iter(self.data_loader)
                batch = next(it)
            batch = shard_batch(batch, self.mesh)
            self.rng, step_rng = jax.random.split(self.rng)
            self.state, loss_dict, metrics, viz = self._train_step(
                self.state, batch, step_rng, alpha
            )

            loss_dict = {k: float(v) for k, v in loss_dict.items()}
            metrics = np.asarray(metrics)
            step = (epoch - 1) * self.len_epoch + batch_idx
            self.writer.set_step(step)
            self.writer.add_scalar("loss", loss_dict["loss"])
            for k, v in loss_dict.items():
                self.writer.add_scalar(f"loss_{k}", v)

            if np.any(np.isnan(metrics)):
                metrics = np.zeros_like(metrics)
            else:
                total_valid += 1
            total_metrics += metrics
            total_loss += loss_dict["loss"]
            total_loss_dict = operator_on_dict(total_loss_dict, loss_dict, lambda a, b: a + b)

            if step % self.log_step == 0:
                extra = ""
                if self.module_timing:
                    times = self._module_times(batch)
                    for k, v in times.items():
                        self.writer.add_scalar(k, v)
                    extra = " " + " ".join(
                        f"{k.removesuffix('_module_time')}={v:.1f}ms"
                        for k, v in times.items()
                    )
                self.logger.debug(
                    f"Train Epoch {epoch} [{batch_idx}/{self.len_epoch}] "
                    f"Loss: {loss_dict['loss']:.6f}{extra}"
                )
                self._log_images(batch, viz)

        log = {
            "loss": total_loss / self.len_epoch,
            "metrics": (total_metrics / np.maximum(total_valid, 1)).tolist(),
        }
        for k, v in total_loss_dict.items():
            log[f"loss_{k}"] = v / self.len_epoch

        if self.valid_data_loader is not None:
            log.update(self._valid_epoch(epoch))
        return log

    def _valid_epoch(self, epoch: int) -> Dict:
        alpha = self._fade_alpha(epoch)
        total_loss = 0.0
        total_metrics = np.zeros(len(self.metric_fns))
        total_valid = np.zeros(len(self.metric_fns))
        n = 0
        for batch_idx, batch in enumerate(self.valid_data_loader):
            batch = shard_batch(batch, self.mesh)
            loss_dict, metrics, viz = self._valid_step(self.state, batch, alpha)
            metrics = np.asarray(metrics)
            if np.any(np.isnan(metrics)):
                metrics = np.zeros_like(metrics)
            else:
                total_valid += 1
            total_metrics += metrics
            total_loss += float(loss_dict["loss"])
            n += 1
            self.writer.set_step((epoch - 1) * len(self.valid_data_loader) + batch_idx, "valid")
            if batch_idx % self.val_log_step == 0:
                self._log_images(batch, viz)
        n = max(n, 1)
        self.writer.add_scalar("loss", total_loss / n)
        for i, m in enumerate(self.metric_fns):
            self.writer.add_scalar(m.__name__, total_metrics[i] / n)
        return {
            "val_loss": total_loss / n,
            "val_metrics": (total_metrics / np.maximum(total_valid, 1)).tolist(),
        }

    # ----- public API -------------------------------------------------------

    def train(self) -> Dict:
        not_improved = 0
        log: Dict = {}
        for epoch in range(self.start_epoch, self.epochs + 1):
            result = self._train_epoch(epoch)

            log = {"epoch": epoch}
            for key, value in result.items():
                if key == "metrics":
                    log.update(
                        {m.__name__: value[i] for i, m in enumerate(self.metric_fns)}
                    )
                elif key == "val_metrics":
                    log.update(
                        {
                            "val_" + m.__name__: value[i]
                            for i, m in enumerate(self.metric_fns)
                        }
                    )
                else:
                    log[key] = value
            for k, v in log.items():
                self.logger.info(f"    {k:20s}: {v}")

            best = False
            if self.mnt_mode != "off":
                if self.mnt_metric not in log:
                    self.logger.warning(
                        f"monitor metric '{self.mnt_metric}' not found; disabling monitoring"
                    )
                    self.mnt_mode = "off"
                else:
                    improved = (
                        self.mnt_mode == "min" and log[self.mnt_metric] <= self.mnt_best
                    ) or (
                        self.mnt_mode == "max" and log[self.mnt_metric] >= self.mnt_best
                    )
                    if improved:
                        self.mnt_best = log[self.mnt_metric]
                        not_improved = 0
                        best = True
                    else:
                        not_improved += 1
                    if not_improved > self.early_stop:
                        self.logger.info(
                            f"No improvement for {self.early_stop} epochs; stopping."
                        )
                        break

            if epoch % self.save_period == 0:
                name = (
                    f"checkpoint-epoch{epoch}" if self.save_multiple else "checkpoint"
                )
                ckpt.save_checkpoint(
                    self.run_dir,
                    name,
                    self.state,
                    epoch,
                    self.mnt_best,
                    keep_link="model_best" if best else None,
                    optimizer_type=self.optimizer_type,
                )
        return log

    def resume(self, checkpoint_path: str, restore_optimizer: bool = True):
        payload = ckpt.load_checkpoint(Path(checkpoint_path))
        # Restore optimizer state only if the optimizer type is unchanged —
        # warn and continue otherwise (reference base/base_trainer.py:180-188).
        saved_opt = payload.get("meta", {}).get("optimizer_type")
        if restore_optimizer and saved_opt is not None and saved_opt != self.optimizer_type:
            self.logger.warning(
                f"Checkpoint optimizer type '{saved_opt}' differs from config "
                f"'{self.optimizer_type}'; optimizer state not restored."
            )
            restore_optimizer = False
        try:
            self.state = ckpt.restore_state(self.state, payload, restore_optimizer)
        except (ValueError, TypeError) as e:
            if not restore_optimizer:
                raise
            self.logger.warning(
                f"Optimizer state incompatible with current optimizer ({e}); "
                "restoring parameters only."
            )
            self.state = ckpt.restore_state(self.state, payload, False)
        meta = payload.get("meta", {})
        self.start_epoch = int(meta.get("epoch", 0)) + 1
        self.mnt_best = float(meta.get("monitor_best", self.mnt_best))
        self.logger.info(f"Resumed from {checkpoint_path} at epoch {self.start_epoch}")
