"""KITTI preprocessing tools (reference ``data_loader/scripts/*.py``).

Three subcommands:

* ``extract-depth``: unpack the KITTI depth-annotated zip into per-sequence
  ``image_depth_annotated/`` folders, using the raw-drive -> odometry
  sequence mapping (seq 08 starts at raw frame 1100, so indices shift).
* ``mvobj-index``: build ``index_mask.json`` per sequence marking samples
  whose moving-object mask contains any moving pixels.
* ``dist-index``: build ``index_mask_dist.json`` filtering samples whose
  pose expanse over the temporal window is below a spatial threshold
  (unused in the paper; kept for completeness).

Usage:
    python tools/preprocess_kitti.py extract-depth -i depth.zip -o data/dataset
    python tools/preprocess_kitti.py mvobj-index -d data/dataset
    python tools/preprocess_kitti.py dist-index -d data/dataset -t 0.8
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
from pathlib import Path
from zipfile import ZipFile

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

RAW_TO_ODOMETRY = {
    "2011_10_03_drive_0027": "00",
    "2011_10_03_drive_0042": "01",
    "2011_10_03_drive_0034": "02",
    "2011_09_26_drive_0067": "03",
    "2011_09_30_drive_0016": "04",
    "2011_09_30_drive_0018": "05",
    "2011_09_30_drive_0020": "06",
    "2011_09_30_drive_0027": "07",
    "2011_09_30_drive_0028": "08",
    "2011_09_30_drive_0033": "09",
    "2011_09_30_drive_0034": "10",
}
SEQ08_OFFSET = 1100  # odometry seq 08 begins at raw frame 1100

ALL_SEQUENCES = [f"{i:02d}" for i in range(11)]


def extract_depth(args):
    out = Path(args.output)
    for seq in RAW_TO_ODOMETRY.values():
        (out / "sequences" / seq / args.depth_folder).mkdir(parents=True, exist_ok=True)

    n = 0
    with ZipFile(args.input) as archive:
        for name in archive.namelist():
            if not name.endswith(".png"):
                continue
            # names: {train,val}/<drive>_sync/proj_depth/groundtruth/image_0X/NNNNNN.png
            drive = name[6:27] if name.startswith("t") else name[4:25]
            cam = name[-16]
            img = name[-10:]
            if cam != "2" or drive not in RAW_TO_ODOMETRY:
                continue
            seq = RAW_TO_ODOMETRY[drive]
            if seq == "08":
                idx = int(img.split(".")[0])
                if idx < SEQ08_OFFSET:
                    continue
                img = f"{idx - SEQ08_OFFSET:06d}.png"
            dst = out / "sequences" / seq / args.depth_folder / img
            with archive.open(name) as i, open(dst, "wb") as o:
                shutil.copyfileobj(i, o)
            n += 1
    print(f"extracted {n} depth maps into {out}")


def mvobj_index(args):
    base = Path(args.dataset)
    total = total_pts = 0
    for seq in args.sequences:
        folder = base / "sequences" / seq / args.mask_folder
        has_object = {}
        seq_total = seq_pts = 0
        for file in sorted(folder.glob("*.npy")):
            mask = np.load(file)
            pts = int(mask.astype(np.int64).sum())
            has_object[int(file.stem)] = pts > 0
            seq_total += pts > 0
            seq_pts += pts
        with open(base / "sequences" / seq / f"{args.output_name}.json", "w") as f:
            json.dump(has_object, f)
        print(
            f"seq {seq}: {seq_total}/{len(has_object)} samples with moving objects, "
            f"{seq_pts} moving pixels"
        )
        total += seq_total
        total_pts += seq_pts
    print(f"total: {total} samples, {total_pts} moving pixels")


def dist_index(args):
    from monorec_tpu.data import KittiOdometryDataset

    base = Path(args.dataset)
    for seq in args.sequences:
        ds = KittiOdometryDataset(
            str(base), sequences=[seq], use_dso_poses=True,
            lidar_depth=True, dso_depth=False, depth_folder="image_depth_annotated",
        )
        enough = {}
        for i in range(len(ds)):
            s = ds[i]
            poses = np.concatenate([s["keyframe_pose"][None], s["poses"]], axis=0)
            t = poses[:, :3, 3]
            spatial = np.linalg.norm(t.max(axis=0) - t.min(axis=0))
            fwd = poses[:, :3, :3] @ np.array([0, 0, 1.0])
            rot = np.linalg.norm(fwd.max(axis=0) - fwd.min(axis=0))
            enough[i + ds._offset] = bool(
                spatial > args.threshold or rot > args.rotational_threshold
            )
        with open(base / "sequences" / seq / "index_mask_dist.json", "w") as f:
            json.dump(enough, f)
        kept = sum(enough.values())
        print(f"seq {seq}: kept {kept}/{len(enough)}")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    e = sub.add_parser("extract-depth")
    e.add_argument("-i", "--input", required=True)
    e.add_argument("-o", "--output", default="data/dataset")
    e.add_argument("-d", "--depth_folder", default="image_depth_annotated")
    e.set_defaults(fn=extract_depth)

    m = sub.add_parser("mvobj-index")
    m.add_argument("-d", "--dataset", default="data/dataset")
    m.add_argument("-m", "--mask_folder", default="mvobj_mask")
    m.add_argument(
        "-o", "--output_name", default="mvobj_index_mask",
        help="JSON name the training configs reference via use_index_mask",
    )
    m.add_argument("-s", "--sequences", nargs="+", default=ALL_SEQUENCES)
    m.set_defaults(fn=mvobj_index)

    d = sub.add_parser("dist-index")
    d.add_argument("-d", "--dataset", default="data/dataset")
    d.add_argument("-s", "--sequences", nargs="+", default=ALL_SEQUENCES)
    d.add_argument("-t", "--threshold", type=float, default=0.8)
    d.add_argument("--rotational_threshold", type=float, default=0.05)
    d.set_defaults(fn=dist_index)

    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
