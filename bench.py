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
    # The recommended TPU serving configuration: bf16 source images inside
    # the fused cost-volume kernel (golden-sample abs_rel drift 3e-6
    # relative, ~1.6x faster sweep). BENCH_WARP_DTYPE=float32 measures the
    # exact-parity path instead.
    warp_dtype = os.environ.get("BENCH_WARP_DTYPE", "bfloat16")
    # bf16 conv compute in the Mask/Depth U-Nets (params stay f32): runs the
    # decoder convs on the MXU at ~2x f32 rate. BENCH_COMPUTE_DTYPE=float32
    # measures the exact-parity path.
    compute_dtype = os.environ.get("BENCH_COMPUTE_DTYPE", "bfloat16")
    model = MonoRec(
        MonoRecConfig(
            cv_depth_steps=32,
            cv_warp_dtype=warp_dtype,
            compute_dtype=compute_dtype,
        )
    )
    batch = _make_batch(batch_size, 256, 512, 2, stereo=False, mask=False)

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
    _note("compiling forward...")
    float(fwd_chained(variables, batch, eps))  # compile
    _note("forward compiled")
    # Steady-state warmup: the first executions after compile run ~40%
    # slower on the axon tunnel (lazy transfer/allocator setup); a single
    # warmup call under-reports by that much.
    for _ in range(5):
        eps = fwd_chained(variables, batch, eps * 1e-9)
    float(eps)

    profile_dir = os.environ.get("BENCH_PROFILE_DIR")
    if profile_dir:
        # jax.profiler trace of a few steps (the reference's analog is the
        # ad-hoc cv_module_time / steps_per_sec counters; here you get the
        # full XLA/TPU timeline).
        with jax.profiler.trace(profile_dir):
            for _ in range(3):
                eps = fwd_chained(variables, batch, eps * 1e-9)
            float(eps)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        eps = fwd_chained(variables, batch, eps * 1e-9)
    float(eps)  # forces the whole chain
    dt = time.perf_counter() - t0
    kf_per_sec = batch_size * iters / dt

    result = {
        "metric": "kitti_256x512_D32_F2_forward_keyframes_per_sec",
        "value": round(kf_per_sec, 2),
        "unit": "keyframes/s/chip",
        "vs_baseline": round(kf_per_sec / 50.0, 3),
    }

    # Same forward under KITTI-like ego-motion (~0.8 m forward between
    # source frames): the larger plane-sweep displacement spread exercises
    # the kernel's tap loop, so this is the conservative throughput bound.
    batch_fwd = _make_batch(batch_size, 256, 512, 2, stereo=False, mask=False, tz=0.4)
    eps = jnp.float32(0.0)
    float(fwd_chained(variables, batch_fwd, eps))
    t0 = time.perf_counter()
    for _ in range(iters):
        eps = fwd_chained(variables, batch_fwd, eps * 1e-9)
    float(eps)
    result["value_fwd_motion"] = round(
        batch_size * iters / (time.perf_counter() - t0), 2
    )

    _note(f"forward done: {result}")
    if os.environ.get("BENCH_TRAIN", "1") != "0":
        result["train_step_kf_per_sec"] = round(_bench_train_step(batch_size), 2)

    print(json.dumps(result))


def _bench_train_step(batch_size: int) -> float:
    """Stage-1 (depth bootstrap) jitted train-step throughput: forward +
    depth_loss + backward + adam update, batch sharded over the local mesh."""
    import time

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_batch
    from monorec_tpu.losses import depth_loss
    from monorec_tpu.models import MonoRec, MonoRecConfig
    from monorec_tpu.train.state import create_train_state, make_optimizer

    model = MonoRec(
        MonoRecConfig(
            cv_depth_steps=32, pretrain_mode=1, pretrain_dropout=0.5,
            augmentation="depth",
            cv_warp_dtype=os.environ.get("BENCH_WARP_DTYPE", "bfloat16"),
            # Mixed-precision training: bf16 conv compute, f32 params/grads/
            # losses. Measured stage-1 loss trajectory tracks f32 within
            # 6e-5 relative after 30 steps.
            compute_dtype=os.environ.get("BENCH_COMPUTE_DTYPE", "bfloat16"),
        )
    )
    batch = _make_batch(batch_size, 256, 512, 2, stereo=True, mask=False)
    tx = make_optimizer({"type": "Adam", "args": {"lr": 1e-4, "amsgrad": True}})
    state = create_train_state(model, batch, jax.random.PRNGKey(0), tx)
    options = ("stereo",)

    @jax.jit
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

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = step(state, batch, rng, loss * 1e-12)
    float(loss)
    dt = time.perf_counter() - t0
    return batch_size * iters / dt


if __name__ == "__main__":
    main()
