"""TUM dataset readers on tiny synthetic on-disk fixtures."""

import numpy as np
import pytest
from PIL import Image

from monorec_tpu.data.tum_mono_vo import TUMMonoVODataset, TUMMonoVOMultiDataset
from monorec_tpu.data.tum_rgbd import TUMRGBDDataset


@pytest.fixture()
def tum_rgbd_root(tmp_path):
    rng = np.random.default_rng(0)
    (tmp_path / "rgb").mkdir()
    (tmp_path / "depth").mkdir()
    n = 6
    rgb_lines, depth_lines, gt_lines = ["# rgb"], ["# depth"], ["# gt"]
    for i in range(n):
        t = 1000.0 + i * 0.1
        img = (rng.uniform(0, 255, (24, 32, 3))).astype(np.uint8)
        Image.fromarray(img).save(tmp_path / "rgb" / f"{t:.4f}.png")
        d = (rng.uniform(500, 5000, (24, 32))).astype(np.uint16)
        Image.fromarray(d, mode="I;16").save(tmp_path / "depth" / f"{t:.4f}.png")
        rgb_lines.append(f"{t:.4f} rgb/{t:.4f}.png")
        depth_lines.append(f"{t:.4f} depth/{t:.4f}.png")
        # slow forward translation, identity rotation quaternion (x y z w)
        gt_lines.append(f"{t:.4f} {0.1*i:.3f} 0.0 0.0 0.0 0.0 0.0 1.0")
    (tmp_path / "rgb.txt").write_text("\n".join(rgb_lines) + "\n")
    (tmp_path / "depth.txt").write_text("\n".join(depth_lines) + "\n")
    (tmp_path / "groundtruth.txt").write_text("\n".join(gt_lines) + "\n")
    return tmp_path


def test_tum_rgbd_reader(tum_rgbd_root):
    ds = TUMRGBDDataset(str(tum_rgbd_root), frame_count=2)
    assert len(ds) == 4
    s = ds[1]
    assert s["keyframe"].shape == (24, 32, 3)
    assert s["frames"].shape == (2, 24, 32, 3)
    assert s["target"].shape == (24, 32, 1)
    # inverse depth from uint16 * 1.035/5000 scaling
    valid = s["target"][s["target"] > 0]
    assert valid.size > 0 and 0.5 < valid.max() < 10.0
    # poses interpolated at rgb timestamps, rebased to the first frame:
    # translation grows along x
    assert s["poses"][1][0, 3] > s["poses"][0][0, 3]


@pytest.fixture()
def tum_mono_root(tmp_path):
    rng = np.random.default_rng(1)
    (tmp_path / "images").mkdir()
    n = 6
    result, times = [], []
    for i in range(n):
        img = (rng.uniform(0, 255, (24, 32))).astype(np.uint8)
        Image.fromarray(img).save(tmp_path / "images" / f"{i:05d}.jpg")
        t = 100.0 + i * 0.05
        times.append(f"{i:05d} {t:.5f} 0.05")
        result.append(f"{t:.5f} {0.05*i:.4f} 0 0 0 0 0 1")
    (tmp_path / "times.txt").write_text("\n".join(times) + "\n")
    (tmp_path / "result.txt").write_text("\n".join(result) + "\n")
    # identity photometric calibration
    pcal = np.linspace(0, 255, 256)
    (tmp_path / "pcalib.txt").write_text(" ".join(f"{v:.2f}" for v in pcal))
    (tmp_path / "camera.txt").write_text("0.5 0.6 0.5 0.5 0\n")
    return tmp_path


def test_tum_mono_vo_reader(tum_mono_root):
    ds = TUMMonoVODataset(
        str(tum_mono_root), frame_count=2, target_image_size=(16, 32),
        color_augmentation=False,
    )
    assert len(ds) == 4
    s = ds[0]
    assert s["keyframe"].shape == (16, 32, 3)
    assert s["frames"].shape == (2, 16, 32, 3)
    assert -0.5 <= s["keyframe"].min() and s["keyframe"].max() <= 0.5
    # no depth EXRs in the fixture -> zero target
    assert np.all(s["target"] == 0)
    k = s["keyframe_intrinsics"]
    assert k[0, 0] > 0 and k[2, 2] == 1

    multi = TUMMonoVOMultiDataset(
        [str(tum_mono_root), str(tum_mono_root)], frame_count=2,
        target_image_size=(16, 32), color_augmentation=False,
    )
    assert len(multi) == 8
    np.testing.assert_array_equal(multi[5]["keyframe"], multi[1]["keyframe"])
