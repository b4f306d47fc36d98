"""Point-cloud export pipeline (reference ``create_pointcloud.py``).

Sequential inference over a frame range; per frame the moving-object mask is
thresholded (cv_mask >= .1), vetoed by a 33x33 ones-conv dilation (a pixel
survives only if NO thresholded pixel falls in its 33x33 neighborhood), and a
5-frame sliding window votes a temporal mask (min_hits); masked inverse depth
is backprojected into a world-frame PLY with random dropout.
"""

from __future__ import annotations

from collections import deque
from pathlib import Path
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from monorec_tpu.export.ply import PLYWriter

MASK_FILL = 32
BUFFER_LENGTH = 5
MIN_HITS = 1


def pointcloud_masks(cv_mask: jnp.ndarray, mask_fill: int = MASK_FILL) -> jnp.ndarray:
    """(B, H, W, 1) cv_mask -> float keep-mask via dilation veto.

    keep = 1 where the (mask_fill+1)^2 neighborhood contains NO pixel with
    cv_mask >= .1 (reference :77-78).
    """
    hit = (cv_mask >= 0.1).astype(jnp.float32)
    pad = mask_fill // 2
    extra = mask_fill - pad  # even kernel: asymmetric pad like torch conv2d
    padded = jnp.pad(hit, ((0, 0), (pad, extra), (pad, extra), (0, 0)))
    counts = jax.lax.reduce_window(
        padded, 0.0, jax.lax.add,
        (1, mask_fill + 1, mask_fill + 1, 1), (1, 1, 1, 1), "VALID",
    )
    return (counts < 1.0).astype(jnp.float32)


def export_pointcloud(
    model,
    variables: Dict,
    data_loader,
    output_path: Path,
    use_mask: bool = True,
    roi: Optional[Sequence[int]] = None,
    min_d: float = 3.0,
    max_d: float = 30.0,
    dropout: float = 0.75,
    progress: bool = True,
) -> Path:
    """Run inference over the loader and write a world-frame PLY."""

    @jax.jit
    def step(batch):
        out = model.apply(variables, batch, False)
        cv_mask = out.get("cv_mask")
        if cv_mask is None:
            cv_mask = jnp.zeros_like(out["result"])
        return out["result"], pointcloud_masks(cv_mask)

    writer = PLYWriter(min_d=min_d, max_d=max_d, roi=roi, dropout=dropout)

    buf: deque = deque()
    key_index = BUFFER_LENGTH // 2

    for i, batch in enumerate(data_loader):
        result, keep = step(batch)
        buf.append(
            dict(
                pose=np.asarray(batch["keyframe_pose"][0]),
                intrinsics=np.asarray(batch["keyframe_intrinsics"][0]),
                keyframe=np.asarray(batch["keyframe"][0]),
                depth=np.asarray(result[0, ..., 0]),
                mask=np.asarray(keep[0, ..., 0]),
            )
        )
        if len(buf) >= BUFFER_LENGTH:
            entry = buf[key_index]
            votes = np.sum([e["mask"] for e in buf], axis=0)
            temporal = (votes > BUFFER_LENGTH - MIN_HITS).astype(np.float32)
            depth = entry["depth"] * (temporal if use_mask else 1.0)
            writer.add_depthmap(
                depth, entry["keyframe"], entry["intrinsics"], entry["pose"]
            )
            buf.popleft()
        if progress and i % 50 == 0:
            print(f"pointcloud: processed {i} frames", flush=True)

    output_path = Path(output_path)
    output_path.parent.mkdir(parents=True, exist_ok=True)
    with open(output_path, "wb") as f:
        writer.save(f)
    return output_path
