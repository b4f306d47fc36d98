"""Benchmark: MonoRec keyframes/sec on one TPU chip (cost volume + full net).

Measures steady-state throughput of the full inference forward (plane-sweep
cost volume, ResNet features, MaskModule, mask-attenuated DepthModule) at the
reference operating point: 256x512 images, 2 source frames, 32 depth
hypotheses. Prints ONE JSON line; ``vs_baseline`` is relative to the
BASELINE.json north-star of 50 keyframes/sec/chip.
"""

import json
import time

import numpy as np


def main():
    import jax

    from __graft_entry__ import _make_batch
    from monorec_tpu.models import MonoRec, MonoRecConfig

    batch_size = int(__import__("os").environ.get("BENCH_BATCH", "8"))
    model = MonoRec(MonoRecConfig(cv_depth_steps=32))
    batch = _make_batch(batch_size, 256, 512, 2, stereo=False, mask=False)

    variables = jax.jit(lambda b: model.init({"params": jax.random.PRNGKey(0)}, b, False))(
        batch
    )

    @jax.jit
    def fwd(variables, batch):
        out = model.apply(variables, batch, False)
        return out["result"], out["cv_mask"]

    # Warmup / compile.
    r, m = fwd(variables, batch)
    jax.block_until_ready(r)

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        r, m = fwd(variables, batch)
    jax.block_until_ready(r)
    dt = time.perf_counter() - t0

    kf_per_sec = batch_size * iters / dt
    print(
        json.dumps(
            {
                "metric": "kitti_256x512_D32_F2_forward_keyframes_per_sec",
                "value": round(kf_per_sec, 2),
                "unit": "keyframes/s/chip",
                "vs_baseline": round(kf_per_sec / 50.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
