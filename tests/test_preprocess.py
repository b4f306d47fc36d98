"""KITTI preprocessing tools on synthetic fixtures (VERDICT r1 weak #6):
zip extraction with the raw-drive mapping + seq-08 offset, mvobj index
building, and the pose-distance index filter, end-to-end through
``tools/preprocess_kitti.py`` (reference ``data_loader/scripts/*.py``)."""

import argparse
import json
import sys
import zipfile
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

import preprocess_kitti  # noqa: E402


def test_extract_depth_mapping_and_seq08_offset(tmp_path):
    """Depth zip entries route to the odometry sequence dirs: cam-2 only,
    mapped drives only, and seq-08 frames shift by the 1100-frame offset
    (reference preprocess_kitti_extract_annotated_depth.py:6-18,53-56)."""
    zpath = tmp_path / "depth.zip"
    png = b"\x89PNG-fake-payload"
    entries = {
        # train split, drive 0027 -> seq 07, cam 2: kept as 000005.png
        "train/2011_09_30_drive_0027_sync/proj_depth/groundtruth/image_02/0000000005.png": png,
        # val split, drive 0016 -> seq 04: kept (val prefix parsing)
        "val/2011_09_30_drive_0016_sync/proj_depth/groundtruth/image_02/0000000009.png": png,
        # cam 3: skipped
        "train/2011_09_30_drive_0027_sync/proj_depth/groundtruth/image_03/0000000005.png": png,
        # unmapped drive: skipped
        "train/2011_09_26_drive_0001_sync/proj_depth/groundtruth/image_02/0000000002.png": png,
        # seq 08 below the offset: skipped
        "train/2011_09_30_drive_0028_sync/proj_depth/groundtruth/image_02/0000000099.png": png,
        # seq 08 above the offset: renamed 1101 - 1100 -> 000001.png
        "train/2011_09_30_drive_0028_sync/proj_depth/groundtruth/image_02/0000001101.png": png,
        # non-png entries ignored
        "train/readme.txt": b"x",
    }
    with zipfile.ZipFile(zpath, "w") as z:
        for name, data in entries.items():
            z.writestr(name, data)

    out = tmp_path / "dataset"
    preprocess_kitti.extract_depth(
        argparse.Namespace(
            input=str(zpath), output=str(out),
            depth_folder="image_depth_annotated",
        )
    )

    extracted = sorted(
        p.relative_to(out).as_posix() for p in out.rglob("*.png")
    )
    assert extracted == [
        "sequences/04/image_depth_annotated/000009.png",
        "sequences/07/image_depth_annotated/000005.png",
        "sequences/08/image_depth_annotated/000001.png",
    ]
    assert (out / "sequences/07/image_depth_annotated/000005.png").read_bytes() == png


def test_mvobj_index(tmp_path):
    """The mvobj index marks exactly the samples whose mask has moving
    pixels (reference preprocess_kitti_mvobj_index_mask.py)."""
    folder = tmp_path / "sequences" / "07" / "mvobj_mask"
    folder.mkdir(parents=True)
    np.save(folder / "000000.npy", np.zeros((8, 16), np.uint8))
    m = np.zeros((8, 16), np.uint8)
    m[2:4, 5:9] = 1
    np.save(folder / "000001.npy", m)
    np.save(folder / "000002.npy", np.zeros((8, 16), np.uint8))

    preprocess_kitti.mvobj_index(
        argparse.Namespace(
            dataset=str(tmp_path), mask_folder="mvobj_mask",
            output_name="mvobj_index_mask", sequences=["07"],
        )
    )
    with open(tmp_path / "sequences/07/mvobj_index_mask.json") as f:
        idx = json.load(f)
    assert idx == {"0": False, "1": True, "2": False}


# ---------------------------------------------------------------------------
# dist-index needs a loadable KittiOdometryDataset -> full synthetic tree.
# ---------------------------------------------------------------------------

N_FRAMES = 16
H, W = 64, 128  # source image size; target (32, 64) keeps the 2:1 aspect


def _make_kitti_tree(root: Path, seq: str = "07") -> None:
    seq_dir = root / "sequences" / seq
    (seq_dir / "image_2").mkdir(parents=True)
    (seq_dir / "image_depth_annotated").mkdir()
    (root / "poses_dvso").mkdir(parents=True)
    (root / "poses").mkdir()

    f, cx, cy = 0.8 * W, W / 2 - 0.5, H / 2 - 0.5
    p = f"{f} 0 {cx} 0 0 {f} {cy} 0 0 0 1 0"
    p3 = f"{f} 0 {cx} {-0.54 * f} 0 {f} {cy} 0 0 0 1 0"
    (seq_dir / "calib.txt").write_text(
        f"P0: {p}\nP1: {p}\nP2: {p}\nP3: {p3}\n"
    )

    rng = np.random.default_rng(0)
    for i in range(N_FRAMES):
        img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
        Image.fromarray(img).save(seq_dir / "image_2" / f"{i:06d}.png")
        depth = np.zeros((H, W), np.uint16)
        ys = rng.integers(4, H - 4, 50)
        xs = rng.integers(4, W - 4, 50)
        depth[ys, xs] = (rng.uniform(5, 50, 50) * 256).astype(np.uint16)
        Image.fromarray(depth).save(
            seq_dir / "image_depth_annotated" / f"{i:06d}.png"
        )

    # Trajectory along +x: tight spacing (0.05 m) through frame 8, then
    # 1 m jumps — so the pose-expanse filter keeps only the moving tail.
    xs = np.zeros(N_FRAMES)
    for i in range(1, N_FRAMES):
        xs[i] = xs[i - 1] + (0.05 if i <= 8 else 1.0)
    lines = []
    for x in xs:
        m = np.eye(4)[:3]
        m[0, 3] = x
        lines.append(" ".join(f"{v:.9f}" for v in m.reshape(-1)))
    (root / "poses_dvso" / f"{seq}.txt").write_text("\n".join(lines))
    (root / "poses" / f"{seq}.txt").write_text("\n".join(lines))


def test_dist_index_filters_by_pose_expanse(tmp_path):
    """dist-index keeps exactly the samples whose pose window spans more
    than the spatial threshold (reference
    preprocess_kitti_dist_index_mask.py; unused in the paper)."""
    _make_kitti_tree(tmp_path)
    preprocess_kitti.dist_index(
        argparse.Namespace(
            dataset=str(tmp_path), sequences=["07"],
            threshold=0.8, rotational_threshold=0.05,
        )
    )
    with open(tmp_path / "sequences/07/index_mask_dist.json") as f:
        idx = json.load(f)

    # lidar_depth datasets have offset 5 / extra 10 -> centers 5..10.
    # Window [c-1, c+1] expanse: 0.1 m for c in {5, 6, 7} (dropped),
    # >= 1 m once the window touches the 1 m-spaced tail (kept).
    assert idx == {
        "5": False, "6": False, "7": False,
        "8": True, "9": True, "10": True,
    }


def test_dist_index_dataset_is_loadable(tmp_path):
    """The synthetic tree is a valid KittiOdometryDataset (guards the
    fixture itself: images, calib, poses, annotated depth all parse)."""
    from monorec_tpu.data import KittiOdometryDataset

    _make_kitti_tree(tmp_path)
    ds = KittiOdometryDataset(
        str(tmp_path), sequences=["07"], target_image_size=(32, 64),
        frame_count=2, depth_folder="image_depth_annotated",
        lidar_depth=True, dso_depth=False, use_dso_poses=True,
    )
    assert len(ds) == N_FRAMES - 10
    s = ds[0]
    assert s["keyframe"].shape == (32, 64, 3)
    assert s["frames"].shape == (2, 32, 64, 3)
    assert np.count_nonzero(s["target"]) > 0  # depth scatter landed
    assert np.allclose(s["keyframe_pose"][0, 3], 0.25)  # center = frame 5
