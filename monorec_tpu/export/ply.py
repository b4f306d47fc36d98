"""Binary PLY point-cloud writer (reference ``utils/ply_utils.py``).

Accumulates XYZRGB points from inverse-depth maps: backproject each valid
pixel by its metric depth, transform to world by the cam-to-world pose, and
append ``(x, y, z, r, g, b)`` float records; written as binary little-endian
PLY. Depth-range mask, optional ROI crop, and random dropout match the
reference behavior (:34-53).
"""

from __future__ import annotations

import struct
from array import array
from typing import Optional, Sequence

import numpy as np


class PLYWriter:
    def __init__(
        self,
        min_d: float = 3.0,
        max_d: float = 400.0,
        roi: Optional[Sequence[int]] = None,
        dropout: float = 0.0,
        seed: int = 0,
    ):
        self.min_d = min_d
        self.max_d = max_d
        self.roi = roi
        self.dropout = dropout
        self._rng = np.random.default_rng(seed)
        self.data = array("f")

    def add_depthmap(
        self,
        inv_depth: np.ndarray,  # (H, W) or (H, W, 1) inverse depth
        image: np.ndarray,  # (H, W, 3) in [-0.5, 0.5]
        intrinsics: np.ndarray,  # (4, 4)
        pose: np.ndarray,  # (4, 4) cam-to-world
    ):
        inv_depth = np.asarray(inv_depth)
        if inv_depth.ndim == 3:
            inv_depth = inv_depth[..., 0]
        h, w = inv_depth.shape
        with np.errstate(divide="ignore"):
            depth = np.where(inv_depth > 0, 1.0 / inv_depth, np.inf)
        mask = (self.min_d <= depth) & (depth <= self.max_d)
        if self.roi is not None:
            t, b, l, r = self.roi
            roi_mask = np.zeros_like(mask)
            roi_mask[t:b, l:r] = True
            mask &= roi_mask
        if self.dropout > 0:
            mask &= self._rng.random(mask.shape) > self.dropout

        ys, xs = np.nonzero(mask)
        if len(ys) == 0:
            return
        z = depth[ys, xs]
        fx, fy = intrinsics[0, 0], intrinsics[1, 1]
        cx, cy = intrinsics[0, 2], intrinsics[1, 2]
        px = (xs - cx) / fx * z
        py = (ys - cy) / fy * z
        pts = np.stack([px, py, z, np.ones_like(z)], axis=0)
        world = (pose @ pts)[:3].T  # (N, 3)

        rgb = (np.asarray(image)[ys, xs] + 0.5) * 255.0
        rec = np.concatenate([world, rgb], axis=1).astype(np.float32)
        self.data.extend(rec.reshape(-1).tolist())

    def save(self, file):
        n = len(self.data) // 6
        header = (
            "ply\n"
            "format binary_little_endian 1.0\n"
            f"element vertex {n}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property float red\nproperty float green\nproperty float blue\n"
            "end_header\n"
        )
        file.write(header.encode("ascii"))
        self.data.tofile(file)
