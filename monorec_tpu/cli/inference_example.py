"""Golden-sample inference demo (reference ``example/test_monorec.py``).

Runs single-keyframe inference on the KITTI seq-07 fixture committed with the
reference repo (frames 000168-000170), saves depth/mask/keyframe PNGs, and
prints the inference latency. Without the reference checkpoint (not
downloadable in this environment) weights are random unless ``--checkpoint``
points at an orbax checkpoint (or a converted ``.pth`` via
``tools/convert_pth.py``).
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path


def main(argv=None):
    import jax
    import numpy as np
    import optax

    from monorec_tpu.data import KittiOdometryDataset
    from monorec_tpu.models import MonoRec, MonoRecConfig
    from monorec_tpu.train.checkpoints import load_submodule_params
    from monorec_tpu.train.state import create_train_state

    p = argparse.ArgumentParser()
    p.add_argument(
        "--data", default="/root/reference/example/data/kitti",
        help="KITTI example fixture root",
    )
    p.add_argument("--index", type=int, default=164, help="dataset index (169-5)")
    p.add_argument("--checkpoint", default=None, help="orbax checkpoint dir")
    p.add_argument("--out", default="saved/example", help="output directory")
    args = p.parse_args(argv)

    dataset = KittiOdometryDataset(
        args.data, sequences=["07"], target_image_size=(256, 512), frame_count=2,
        depth_folder="image_depth_annotated", lidar_depth=True, dso_depth=False,
        use_dso_poses=True, custom_length=1000,
    )

    model = MonoRec(MonoRecConfig(inv_depth_min_max=(0.33, 0.0025)))

    sample = dataset[args.index]
    batch = {k: np.asarray(v)[None] for k, v in sample.items()}

    state = create_train_state(
        model, batch, jax.random.PRNGKey(0), optax.identity(), train=False
    )
    params = state.params
    if args.checkpoint:
        params = load_submodule_params(params, [args.checkpoint], None)
    else:
        import sys

        print(
            "=" * 70
            + "\nWARNING: no --checkpoint given — the model weights are RANDOM.\n"
            "The saved depth/mask PNGs are NOT the MonoRec golden sample; they\n"
            "only demonstrate the pipeline. Convert the reference checkpoint\n"
            "(tools/convert_pth.py monorec_depth_ref.pth <out>) and pass\n"
            "--checkpoint <out> for real results.\n" + "=" * 70,
            file=sys.stderr,
        )
    variables = {"params": params, "batch_stats": state.batch_stats}

    fwd = jax.jit(lambda v, b: model.apply(v, b, False))
    out = fwd(variables, batch)  # compile
    jax.block_until_ready(out["result"])

    s = time.time()
    out = fwd(variables, batch)
    jax.block_until_ready(out["result"])
    e = time.time()
    print(f"Inference took {e - s:.4f}s (jit-compiled, after warmup)")

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.imsave(out_dir / "depth.png", np.asarray(out["result"][0, ..., 0]))
        plt.imsave(out_dir / "mask.png", np.asarray(out["cv_mask"][0, ..., 0]))
        plt.imsave(
            out_dir / "kf.png",
            np.clip(np.asarray(batch["keyframe"][0]) + 0.5, 0, 1),
        )
    except ImportError:
        from PIL import Image

        def save(name, arr):
            arr = np.asarray(arr, dtype=np.float64)
            arr = (arr - arr.min()) / max(arr.max() - arr.min(), 1e-9)
            Image.fromarray((arr * 255).astype(np.uint8)).save(out_dir / name)

        save("depth.png", np.asarray(out["result"][0, ..., 0]))
        save("mask.png", np.asarray(out["cv_mask"][0, ..., 0]))
        save("kf.png", np.asarray(batch["keyframe"][0]) + 0.5)
    print(f"wrote depth.png / mask.png / kf.png to {out_dir}")


if __name__ == "__main__":
    main()
