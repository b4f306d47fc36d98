"""KITTI Odometry dataset reader (self-contained, no pykitti).

Produces the NHWC batch contract of ``monorec_tpu.models.monorec`` from a
standard KITTI Odometry layout::

    <root>/sequences/<seq>/{calib.txt, image_2/, image_3/, <depth_folder>/}
    <root>/poses/<seq>.txt          (or poses_dvso/<seq>.txt)

Behavioral contract follows the reference ``KittiOdometryDataset``
(``data_loader/kitti_odometry_dataset.py``):

* temporal window: ``frame_count`` source frames around the keyframe with
  ``dilation`` spacing and optional ``offset_d`` shift;
* center-crop to the target aspect ratio + bilinear resize with exact
  intrinsics rescaling (:318-349);
* three GT depth modalities returning **inverse** depth with 0 = invalid:
  annotated-LiDAR PNGs (value/256 m), DVSO sparse depth PNGs, and dense
  ``.npy`` maps (:136-211);
* optional stereo frame (cam3) with baseline-translated pose (:103-108),
  moving-object masks (:280-284), JSON index masks (:62-77), and per-sample
  color jitter applied identically to all frames (:377-383).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from monorec_tpu.data.color_jitter import sample_color_jitter, apply_color_jitter


def load_calib(path: Path) -> Dict[str, np.ndarray]:
    out = {}
    with open(path) as f:
        for line in f:
            if ":" not in line:
                continue
            key, vals = line.split(":", 1)
            arr = np.fromstring(vals, sep=" ", dtype=np.float64)
            if arr.size == 12:
                out[key.strip()] = arr.reshape(3, 4)
    return out


def load_poses(path: Path) -> np.ndarray:
    """(N, 4, 4) cam-to-world poses from a KITTI odometry poses file."""
    data = np.loadtxt(path, dtype=np.float64).reshape(-1, 3, 4)
    n = data.shape[0]
    poses = np.tile(np.eye(4, dtype=np.float64), (n, 1, 1))
    poses[:, :3, :] = data
    return poses.astype(np.float32)


def compute_crop_and_intrinsics(
    proj: np.ndarray,
    orig_size: Tuple[int, int],  # (H, W)
    target_size: Tuple[int, int],
) -> Tuple[Tuple[int, int, int, int], np.ndarray]:
    """Center crop box (l, t, r, b) to the target aspect + 4x4 intrinsics in
    target-pixel units. Mirrors reference :318-349 + format_intrinsics."""
    oh, ow = orig_size
    th, tw = target_size
    r_orig = oh / ow
    r_target = th / tw

    if r_orig >= r_target:
        # too tall: crop rows
        new_h = r_target * ow
        top = (oh - new_h) // 2
        box = (0, int(top), ow, int(oh - top))
        cx = proj[0, 2]
        cy = proj[1, 2] - (oh - new_h) / 2
        scale = tw / ow
    else:
        # too wide: crop columns (KITTI case)
        new_w = oh / r_target
        left = (ow - new_w) // 2
        box = (int(left), 0, int(ow - left), oh)
        cx = proj[0, 2] - (ow - new_w) / 2
        cy = proj[1, 2]
        scale = th / oh

    k = np.zeros((4, 4), dtype=np.float32)
    k[0, 0] = proj[0, 0] * scale
    k[1, 1] = proj[1, 1] * scale
    k[0, 2] = cx * scale
    k[1, 2] = cy * scale
    k[2, 2] = k[3, 3] = 1.0
    return box, k


def scatter_sparse_depth(
    rows: np.ndarray,
    cols: np.ndarray,
    inv_depth: np.ndarray,
    src_size: Tuple[int, int],
    crop_box: Optional[Tuple[int, int, int, int]],
    target_size: Tuple[int, int],
) -> np.ndarray:
    """Scatter sparse inverse-depth samples into a target-resolution map."""
    th, tw = target_size
    rows = rows.astype(np.float64)
    cols = cols.astype(np.float64)
    if crop_box is not None:
        l, t, r, b = crop_box
        keep = (t <= rows) & (rows < b) & (l <= cols) & (cols < r)
        rows, cols, inv_depth = rows[keep] - t, cols[keep] - l, inv_depth[keep]
        ch, cw = b - t, r - l
    else:
        ch, cw = src_size
    rr = np.clip(rows / ch * th, 0, th - 1)
    cc = np.clip(cols / cw * tw, 0, tw - 1)
    out = np.zeros(target_size, dtype=np.float32)
    out[np.around(rr).astype(np.int64), np.around(cc).astype(np.int64)] = inv_depth
    return out


class KittiOdometryDataset:
    def __init__(
        self,
        dataset_dir: str,
        frame_count: int = 2,
        sequences: Optional[Sequence[str]] = None,
        depth_folder: str = "image_depth",
        target_image_size: Tuple[int, int] = (256, 512),
        max_length: Optional[int] = None,
        dilation: int = 1,
        offset_d: int = 0,
        use_color: bool = True,
        use_dso_poses: bool = False,
        use_color_augmentation: bool = False,
        lidar_depth: bool = False,
        dso_depth: bool = True,
        annotated_lidar: bool = True,
        return_stereo: bool = False,
        return_mvobj_mask: int = 0,
        use_index_mask: Optional[Sequence[str]] = (),
        custom_length: Optional[int] = None,
        seed: int = 0,
    ):
        self.root = Path(dataset_dir)
        self.frame_count = frame_count
        self.depth_folder = depth_folder
        self.target_image_size = tuple(target_image_size)
        self.dilation = dilation
        self.offset_d = offset_d
        self.use_color = use_color
        self.use_dso_poses = use_dso_poses
        self.use_color_augmentation = use_color_augmentation
        self.lidar_depth = lidar_depth
        self.dso_depth = dso_depth
        self.annotated_lidar = annotated_lidar
        self.return_stereo = return_stereo
        self.return_mvobj_mask = int(return_mvobj_mask)
        self.use_index_mask = use_index_mask
        self._rng = np.random.default_rng(seed)

        self.sequences = (
            list(sequences) if sequences is not None else [f"{i:02d}" for i in range(11)]
        )

        self._offset = (frame_count // 2) * dilation
        extra = frame_count * dilation
        if self.annotated_lidar and self.lidar_depth:
            extra = max(extra, 10)
            self._offset = max(self._offset, 5)
        self._extra = extra

        cam = "image_2" if use_color else "image_0"
        self._calibs = {}
        self._poses = {}
        self._crop_boxes = {}
        self._intrinsics = {}
        self._num_images = {}
        self._orig_sizes = {}
        self._baselines = {}

        pose_dir = "poses_dvso" if use_dso_poses else "poses"

        for seq in self.sequences:
            seq_dir = self.root / "sequences" / seq
            calib = load_calib(seq_dir / "calib.txt")
            proj = calib["P2"] if use_color else calib["P0"]
            img_files = sorted((seq_dir / cam).glob("*.png"))
            if not img_files:
                raise FileNotFoundError(f"no images in {seq_dir / cam}")
            with Image.open(img_files[0]) as im:
                ow, oh = im.size
            box, k = compute_crop_and_intrinsics(
                proj, (oh, ow), self.target_image_size
            )
            self._calibs[seq] = calib
            self._crop_boxes[seq] = box
            self._intrinsics[seq] = k
            self._orig_sizes[seq] = (oh, ow)
            # Highest numbered image + 1 (fixture dirs are sparse).
            self._num_images[seq] = int(img_files[-1].stem) + 1
            self._poses[seq] = load_poses(self.root / pose_dir / f"{seq}.txt")
            if return_stereo:
                p2, p3 = calib["P2"], calib["P3"]
                self._baselines[seq] = float(
                    abs(p3[0, 3] / p3[0, 0] - p2[0, 3] / p2[0, 0])
                )

        # Per-sequence sample counts (index masks shrink them).
        self._sizes: List[int] = []
        self._indices: Optional[List[List[int]]] = None
        if self.use_index_mask:
            self._indices = []
            for seq in self.sequences:
                n = self._num_images[seq]
                allowed = {i: True for i in range(n)}
                for mask_name in self.use_index_mask:
                    with open(self.root / "sequences" / seq / f"{mask_name}.json") as f:
                        m = json.load(f)
                    allowed = {
                        i: True for i in allowed if str(i) in m and m[str(i)]
                    }
                idx = sorted(
                    i for i in allowed if self._offset <= i < n - extra + self._offset
                )
                self._indices.append(idx)
                self._sizes.append(len(idx))
        else:
            for seq in self.sequences:
                self._sizes.append(self._num_images[seq] - extra)

        if custom_length is not None:
            self._sizes = [custom_length] + self._sizes[1:]
        if max_length is not None:
            self._sizes = [min(s, max_length) for s in self._sizes]
        self.length = sum(self._sizes)

    # ------------------------------------------------------------------

    def __len__(self) -> int:
        return self.length

    def _locate(self, index: int) -> Tuple[str, int]:
        for seq, size in zip(self.sequences, self._sizes):
            if index < size:
                return seq, index
            index -= size
        raise IndexError(index)

    def _image_path(self, seq: str, i: int, stereo: bool = False) -> Path:
        if self.use_color:
            cam = "image_3" if stereo else "image_2"
        else:
            cam = "image_1" if stereo else "image_0"
        return self.root / "sequences" / seq / cam / f"{i:06d}.png"

    def _load_image(self, path: Path, seq: str, jitter=None) -> np.ndarray:
        with Image.open(path) as im:
            im = im.crop(self._crop_boxes[seq])
            th, tw = self.target_image_size
            im = im.resize((tw, th), resample=Image.BILINEAR)
            arr = np.asarray(im, dtype=np.float32) / 255.0
        if jitter is not None:
            arr = apply_color_jitter(arr, jitter)
        arr = arr - 0.5
        if arr.ndim == 2:
            arr = np.stack([arr] * 3, axis=-1)
        return arr

    def _load_depth(self, seq: str, i: int) -> np.ndarray:
        """Inverse-depth GT (H, W, 1), 0 = invalid."""
        depth_dir = self.root / "sequences" / seq / self.depth_folder
        box = self._crop_boxes[seq]
        # reference crop-box convention for depth: (l, t, r, b)
        th, tw = self.target_image_size

        result = np.zeros(self.target_image_size, dtype=np.float32)

        if self.lidar_depth and self.annotated_lidar:
            arr = np.asarray(Image.open(depth_dir / f"{i:06d}.png"), dtype=np.float64)
            rows, cols = np.nonzero(arr)
            vals = 256.0 / arr[rows, cols]  # value = depth_m*256 -> inverse
            result = scatter_sparse_depth(
                rows, cols, vals, arr.shape, (box[0], box[1], box[2], box[3]), self.target_image_size
            )
        elif self.lidar_depth:
            from scipy import sparse as sp

            dense = np.asarray(sp.load_npz(depth_dir / f"{i:06d}.npz").todense())
            with np.errstate(divide="ignore"):
                inv = np.where(dense > 0, 1.0 / dense, 0.0)
            # dense map is at original resolution; nearest resize after crop
            l, t, r, b = box
            inv = inv[t:b, l:r]
            ys = (np.arange(th) * inv.shape[0] // th).astype(np.int64)
            xs = (np.arange(tw) * inv.shape[1] // tw).astype(np.int64)
            result = inv[ys][:, xs].astype(np.float32)
        elif not self.dso_depth:
            dense = np.load(depth_dir / f"{i:06d}.npy")
            l, t, r, b = box
            dense = dense[t:b, l:r]
            ys = (np.arange(th) * dense.shape[0] // th).astype(np.int64)
            xs = (np.arange(tw) * dense.shape[1] // tw).astype(np.int64)
            with np.errstate(divide="ignore"):
                result = np.where(dense > 0, 1.0 / dense, 0.0)[ys][:, xs].astype(
                    np.float32
                )

        if self.dso_depth:
            oh, ow = self._orig_sizes[seq]
            fx = (self._calibs[seq]["P2"] if self.use_color else self._calibs[seq]["P0"])[0, 0]
            arr = np.asarray(Image.open(depth_dir / f"{i:06d}.png"), dtype=np.float64)
            rows, cols = np.nonzero(arr)
            rows_s = np.clip(rows / arr.shape[0] * oh, 0, oh - 1)
            cols_s = np.clip(cols / arr.shape[1] * ow, 0, ow - 1)
            vals = ow * arr[rows, cols] / (0.54 * fx * 65535.0)
            dso = scatter_sparse_depth(
                rows_s, cols_s, vals, (oh, ow), box, self.target_image_size
            )
            # DSO samples override; LiDAR/other fills holes.
            result = np.where(dso != 0, dso, result)

        return result[..., None].astype(np.float32)

    # ------------------------------------------------------------------

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        seq, local = self._locate(index)
        if self._indices is not None:
            center = self._indices[self.sequences.index(seq)][local]
        else:
            center = local + self._offset

        jitter = (
            sample_color_jitter(self._rng) if self.use_color_augmentation else None
        )

        keyframe = self._load_image(self._image_path(seq, center), seq, jitter)
        poses = self._poses[seq]
        k = self._intrinsics[seq]

        rel = [
            i
            for i in range(
                -(self.frame_count // 2) * self.dilation,
                ((self.frame_count + 1) // 2) * self.dilation + 1,
                self.dilation,
            )
            if i != 0
        ]
        frames = np.stack(
            [
                self._load_image(
                    self._image_path(seq, center + i + self.offset_d), seq, jitter
                )
                for i in rel
            ]
        )
        frame_poses = np.stack(
            [poses[center + i + self.offset_d] for i in rel]
        ).astype(np.float32)

        sample: Dict[str, np.ndarray] = {
            "keyframe": keyframe.astype(np.float32),
            "keyframe_pose": poses[center].astype(np.float32),
            "keyframe_intrinsics": k,
            "frames": frames.astype(np.float32),
            "poses": frame_poses,
            "intrinsics": np.tile(k[None], (len(rel), 1, 1)),
            "sequence": np.asarray([int(seq)], dtype=np.int32),
            "image_id": np.asarray([center], dtype=np.int32),
            "target": self._load_depth(seq, center),
        }

        if self.return_stereo:
            st = np.eye(4, dtype=np.float32)
            st[0, 3] = self._baselines[seq]
            sample["stereoframe"] = self._load_image(
                self._image_path(seq, center, stereo=True), seq, jitter
            ).astype(np.float32)
            sample["stereoframe_pose"] = (poses[center] @ st).astype(np.float32)
            sample["stereoframe_intrinsics"] = k

        if self.return_mvobj_mask > 0:
            mask = np.load(
                self.root / "sequences" / seq / "mvobj_mask" / f"{center:06d}.npy"
            ).astype(np.float32)
            sample["mvobj_mask"] = mask[..., None]
            if self.return_mvobj_mask == 2:
                sample["target"] = sample["mvobj_mask"]

        return sample
