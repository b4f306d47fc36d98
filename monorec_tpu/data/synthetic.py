"""Synthetic plane-sweep dataset for tests and smoke training.

Generates textured fronto-parallel planes observed by a translating camera so
every sample has an exactly-known depth; useful as a fast mini-KITTI stand-in
(dataset-contract tests, trainer smoke runs) without any data on disk.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


class SyntheticSweepDataset:
    def __init__(
        self,
        length: int = 64,
        target_image_size: Tuple[int, int] = (64, 128),
        frame_count: int = 2,
        depth_range: Tuple[float, float] = (4.0, 40.0),
        baseline: float = 0.4,
        return_stereo: bool = False,
        return_mvobj_mask: int = 0,
        seed: int = 0,
        **_: object,
    ):
        self.length = length
        self.size = tuple(target_image_size)
        self.frame_count = frame_count
        self.depth_range = depth_range
        self.baseline = baseline
        self.return_stereo = return_stereo
        self.return_mvobj_mask = int(return_mvobj_mask)
        self.seed = seed
        self.target_image_size = self.size

        h, w = self.size
        self.fx = 0.8 * w
        k = np.zeros((4, 4), np.float32)
        k[0, 0] = k[1, 1] = self.fx
        k[0, 2], k[1, 2] = w / 2 - 0.5, h / 2 - 0.5
        k[2, 2] = k[3, 3] = 1.0
        self.k = k

    def __len__(self) -> int:
        return self.length

    def _render(self, phase: np.ndarray, depth: float, cam_x: float) -> np.ndarray:
        h, w = self.size
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        wx = (xs - self.k[0, 2]) / self.fx * depth + cam_x
        wy = (ys - self.k[1, 2]) / self.fx * depth
        img = np.zeros((h, w, 3), np.float32)
        for c in range(3):
            img[..., c] = 0.35 * np.sin(wx * phase[c] + phase[c + 3]) * np.cos(
                wy * phase[c + 6] + phase[c + 9]
            )
        return img

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        rng = np.random.default_rng(self.seed * 100003 + index)
        h, w = self.size
        depth = float(rng.uniform(*self.depth_range))
        phase = rng.uniform(0.5, 2.5, 12)

        keyframe = self._render(phase, depth, 0.0)
        offsets = [
            (i - self.frame_count // 2 + (1 if i >= self.frame_count // 2 else 0))
            for i in range(self.frame_count)
        ]
        frames = np.stack(
            [self._render(phase, depth, o * self.baseline) for o in offsets]
        )
        poses = np.tile(np.eye(4, dtype=np.float32), (self.frame_count, 1, 1))
        for i, o in enumerate(offsets):
            poses[i, 0, 3] = o * self.baseline

        sample = {
            "keyframe": keyframe,
            "keyframe_pose": np.eye(4, dtype=np.float32),
            "keyframe_intrinsics": self.k,
            "frames": frames,
            "poses": poses,
            "intrinsics": np.tile(self.k[None], (self.frame_count, 1, 1)),
            "sequence": np.asarray([0], dtype=np.int32),
            "image_id": np.asarray([index], dtype=np.int32),
            "target": np.full((h, w, 1), 1.0 / depth, np.float32),
        }
        if self.return_stereo:
            st = np.eye(4, dtype=np.float32)
            st[0, 3] = 0.54
            sample["stereoframe"] = self._render(phase, depth, 0.54)
            sample["stereoframe_pose"] = st
            sample["stereoframe_intrinsics"] = self.k
        if self.return_mvobj_mask:
            mask = np.zeros((h, w, 1), np.float32)
            mask[h // 4 : h // 2, w // 4 : w // 2] = 1.0
            sample["mvobj_mask"] = mask
            if self.return_mvobj_mask == 2:
                sample["target"] = mask
        return sample
