"""Benchmark: MonoRec keyframes/sec on one TPU chip (cost volume + full net).

Measures steady-state throughput of the full inference forward (plane-sweep
cost volume via the fused Pallas warp kernel, ResNet features, MaskModule,
mask-attenuated DepthModule) at the reference operating point: 256x512
images, 2 source frames, 32 depth hypotheses. Prints ONE JSON line;
``vs_baseline`` is relative to the BASELINE.json north-star of 50
keyframes/sec/chip.

Timing uses chained data dependencies + scalar fetch: under the remote axon
backend, ``block_until_ready`` is not a reliable fence.
"""

import functools
import json
import os
import sys
import time


def _note(msg):
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_tpu_cache"),
    )
    # The axon TPU backend has transient outages (observed: 30+ min of
    # UNAVAILABLE after a killed TPU process); don't let one turn a bench
    # run into a recorded failure. A failed init is cached for the life of
    # a process, so probe in a SUBPROCESS and only import jax here once a
    # probe succeeds (each blocked probe itself waits out part of the
    # outage before erroring, so this self-paces).
    import subprocess

    for attempt in range(5):
        probe = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            capture_output=True, text=True,
        )
        if probe.returncode == 0:
            break
        _note(f"TPU backend unavailable (attempt {attempt + 1}/5); "
              "retrying in 120s")
        time.sleep(120)

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_batch
    from monorec_tpu.models import MonoRec, MonoRecConfig

    batch_size = int(os.environ.get("BENCH_BATCH", "8"))

    def bench_forward(warp_dtype, compute_dtype, motion=False):
        """Steady-state forward keyframes/sec at the given precision."""
        model = MonoRec(
            MonoRecConfig(
                cv_depth_steps=32,
                cv_warp_dtype=warp_dtype,
                compute_dtype=compute_dtype,
            )
        )
        batch = _make_batch(
            batch_size, 256, 512, 2, stereo=False, mask=False,
            tz=0.4 if motion else 0.0,
        )
        variables = jax.jit(
            lambda b: model.init({"params": jax.random.PRNGKey(0)}, b, False)
        )(batch)

        @jax.jit
        def fwd_chained(v, b, eps):
            b = dict(b)
            b["keyframe"] = b["keyframe"] + eps
            out = model.apply(v, b, False)
            return out["result"].mean() + out["cv_mask"].mean()

        eps = jnp.float32(0.0)
        float(fwd_chained(variables, batch, eps))  # compile
        # Steady-state warmup: the first executions after compile run ~40%
        # slower on the axon tunnel (lazy transfer/allocator setup); a single
        # warmup call under-reports by that much.
        for _ in range(5):
            eps = fwd_chained(variables, batch, eps * 1e-9)
        float(eps)

        profile_dir = os.environ.get("BENCH_PROFILE_DIR")
        if profile_dir and not motion and warp_dtype == "bfloat16":
            # jax.profiler trace of a few steps (the reference's analog is
            # the ad-hoc cv_module_time / steps_per_sec counters; here you
            # get the full XLA/TPU timeline).
            with jax.profiler.trace(profile_dir):
                for _ in range(3):
                    eps = fwd_chained(variables, batch, eps * 1e-9)
                float(eps)

        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            eps = fwd_chained(variables, batch, eps * 1e-9)
        float(eps)  # forces the whole chain
        return batch_size * iters / (time.perf_counter() - t0)

    # "value" is the recommended TPU serving configuration (bf16 warps +
    # bf16 U-Net compute; parity drift ≪ the 1% budget, see PARITY.md);
    # "value_f32" is the exact reference-parity configuration.
    _note("compiling + timing serving (bf16) forward...")
    kf_per_sec = bench_forward("bfloat16", "bfloat16")
    result = {
        "metric": "kitti_256x512_D32_F2_forward_keyframes_per_sec",
        "value": round(kf_per_sec, 2),
        "unit": "keyframes/s/chip",
        "vs_baseline": round(kf_per_sec / 50.0, 3),
    }
    _note(f"serving forward: {result['value']} kf/s; timing exact f32...")
    result["value_f32"] = round(bench_forward("float32", "float32"), 2)

    # Same forward under KITTI-like ego-motion (~0.8 m forward between
    # source frames): the larger plane-sweep displacement spread exercises
    # the kernel's tap loop, so this is the conservative throughput bound.
    _note("timing forward under ego-motion...")
    result["value_fwd_motion"] = round(
        bench_forward("bfloat16", "bfloat16", motion=True), 2
    )

    _note(f"forward done: {result}")
    if os.environ.get("BENCH_TRAIN", "1") != "0":
        med, spread = _bench_train_step(batch_size)
        result["train_step_kf_per_sec"] = round(med, 2)
        result["train_step_kf_per_sec_spread"] = round(spread, 2)

    print(json.dumps(result))


def _bench_train_step(batch_size: int):
    """Stage-1 (depth bootstrap) jitted train-step throughput: forward +
    depth_loss + backward + adam update. Returns (median, spread) over
    several timing windows — steady-state, robust to axon-tunnel jitter."""
    import time

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_batch
    from monorec_tpu.losses import depth_loss
    from monorec_tpu.models import MonoRec, MonoRecConfig
    from monorec_tpu.precision import set_precision
    from monorec_tpu.train.state import create_train_state, make_optimizer

    # Mixed-precision training policy: bf16 warps (CV + loss reprojection)
    # and bf16 U-Net conv compute, f32 params/grads/losses. Measured stage-1
    # loss trajectory tracks f32 within 6e-5 relative after 30 steps.
    set_precision("serving")
    model = MonoRec(
        MonoRecConfig(
            cv_depth_steps=32, pretrain_mode=1, pretrain_dropout=0.5,
            augmentation="depth",
            cv_warp_dtype="bfloat16",
            compute_dtype="bfloat16",
        )
    )
    batch = _make_batch(batch_size, 256, 512, 2, stereo=True, mask=False)
    tx = make_optimizer({"type": "Adam", "args": {"lr": 1e-4, "amsgrad": True}})
    state = create_train_state(model, batch, jax.random.PRNGKey(0), tx)
    options = ("stereo",)

    # donate_argnums matches the shipped trainer (train/trainer.py:173):
    # the step consumes the previous state's buffers in place, saving the
    # params/opt-state copies (measured ~6 ms/step at batch 8).
    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, batch, rng, eps):
        batch = dict(batch)
        batch["keyframe"] = batch["keyframe"] + eps

        def losses(params):
            out = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch, True,
                rngs={
                    "dropout": jax.random.fold_in(rng, 0),
                    "augment": jax.random.fold_in(rng, 1),
                },
            )
            return depth_loss({**batch, **out}, 0.5, None, options)["loss"]

        loss, grads = jax.value_and_grad(losses)(state.params)
        return state.apply_gradients(grads), loss

    rng = jax.random.PRNGKey(1)
    eps = jnp.float32(0.0)
    _note("compiling train step...")
    state, loss = step(state, batch, rng, eps)
    float(loss)  # compile + warmup
    _note("train step compiled")
    for _ in range(3):
        state, loss = step(state, batch, rng, loss * 1e-12)
    float(loss)

    # Median + spread over windows: single-window numbers vary ~10% between
    # runs on the axon tunnel (the r02 36.97 vs README 41.5 discrepancy).
    rates = []
    iters = 5
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, loss = step(state, batch, rng, loss * 1e-12)
        float(loss)
        rates.append(batch_size * iters / (time.perf_counter() - t0))
    rates.sort()
    return rates[len(rates) // 2], rates[-1] - rates[0]


if __name__ == "__main__":
    main()
