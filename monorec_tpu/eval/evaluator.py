"""Evaluation loop (reference ``evaluater/evaluater.py`` semantics).

One jitted forward + metric computation per batch; NaN batches invalidate
every metric for that batch (reference :38-50); both the count-normalized
totals and the running-average-corrected totals are reported (:98-103, the
"metrics_correct" entry); optional per-batch median scaling (:36,41-42).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from monorec_tpu.parallel import make_mesh, shard_batch
from monorec_tpu.train.loggers import setup_logging
from monorec_tpu.utils import median_scaling


class Evaluator:
    def __init__(
        self,
        model,
        variables: Dict,
        metric_fns: Sequence[Callable],
        config: Dict,
        data_loader,
        run_dir: str = "saved/eval",
        mesh=None,
    ):
        self.model = model
        self.variables = variables
        self.metric_fns = list(metric_fns)
        self.data_loader = data_loader
        self.mesh = mesh if mesh is not None else make_mesh()

        ecfg = config.get("evaluater", {})
        self.roi = ecfg.get("roi")
        self.max_distance = ecfg.get("max_distance")
        self.use_median_scaling = ecfg.get("median_scaling", False)
        self.log_step = ecfg.get("log_step", 10)

        self.run_dir = Path(run_dir)
        self.run_dir.mkdir(parents=True, exist_ok=True)
        self.logger = setup_logging(self.run_dir, name="evaluator")

        roi, max_distance = self.roi, self.max_distance
        use_ms = self.use_median_scaling
        metric_fns = self.metric_fns

        def step(variables, batch):
            out = model.apply(variables, batch, False)
            data = {**batch, **out}
            if use_ms:
                data = dict(data)
                data["result"] = median_scaling(data["result"], data["target"])
            metrics = jnp.stack([m(data, roi, max_distance) for m in metric_fns])
            return metrics, data["result"]

        self._step = jax.jit(step)

    def eval(self, model_index: int = 0) -> Dict:
        n_metrics = len(self.metric_fns)
        total = np.zeros(n_metrics)
        valid = np.zeros(n_metrics)
        running = np.zeros(n_metrics)
        num_samples = 0
        n_batches = 0

        for batch_idx, batch in enumerate(self.data_loader):
            batch = shard_batch(batch, self.mesh)
            metrics, _ = self._step(self.variables, batch)
            metrics = np.asarray(metrics)
            if np.any(np.isnan(metrics)):
                metrics = np.zeros(n_metrics)
            else:
                valid += 1
            total += metrics

            bs = batch["target"].shape[0]
            if num_samples == 0:
                running += metrics
            else:
                running = running * (num_samples / (num_samples + bs)) + metrics * (
                    bs / (num_samples + bs)
                )
            num_samples += bs
            n_batches += 1

            if batch_idx % self.log_step == 0:
                self.logger.debug(
                    f"Evaluating [{batch_idx}/{len(self.data_loader)}] "
                    f"metrics: {list(total / max(batch_idx + 1, 1))}"
                )

        log = {
            "metrics": (total / np.maximum(valid, 1)).tolist(),
            "metrics_correct": running.tolist(),
            "valid_batches": float(valid[0]) if n_metrics else 0.0,
            "num_samples": num_samples,
        }
        for i, m in enumerate(self.metric_fns):
            log[m.__name__] = log["metrics"][i]
        return log

    def save_results(self, log: Dict, extra: Optional[Dict] = None, name: str = "results.json"):
        payload = {"metrics": log}
        if extra:
            payload.update(extra)
        with open(self.run_dir / name, "w") as f:
            json.dump(payload, f, indent=2, default=str)
        return self.run_dir / name
