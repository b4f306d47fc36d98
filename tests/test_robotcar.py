"""Oxford RobotCar pipeline on a synthetic SDK-format fixture.

Round 1 left the RobotCar reader (and its native SDK replacement) write-only
code; this builds a tiny on-disk fixture in the SDK's file formats — Bayer
PNGs, ``models/*.txt`` + distortion LUT, ``vo.csv``, extrinsics, LiDAR
``.bin`` scans — and drives ``CameraModel.undistort``, demosaicing, pose
interpolation, and LiDAR projection end to end (VERDICT r1 "Next" #8).
Reference semantics: ``data_loader/oxford_robotcar_dataset.py``.
"""

from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from monorec_tpu.data.pose_interp import interpolate_vo_poses, se3_from_xyzrpy
from monorec_tpu.data.robotcar import (
    CameraModel,
    OxfordRobotCarDataset,
    load_image,
)

H_RAW, W_RAW = 64, 96
FX = FY = 40.0
CX, CY = W_RAW / 2, H_RAW / 2
SCALE = 0.5
TS = [1000000 + 100000 * i for i in range(5)]  # microsecond timestamps


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("robotcar")
    img_dir = root / "stereo" / "centre"
    img_dir.mkdir(parents=True)
    models = root / "models"
    models.mkdir()
    extr = root / "extrinsics"
    extr.mkdir()
    lidar = root / "ldmrs"
    lidar.mkdir()

    # Camera model: "fx fy cx cy" first row (SDK models/<camera>.txt format).
    (models / "stereo_narrow_left.txt").write_text(f"{FX} {FY} {CX} {CY}\n")
    # Distortion LUT: sample each pixel from one column to the left.
    ys, xs = np.meshgrid(np.arange(H_RAW), np.arange(W_RAW), indexing="ij")
    lu = np.clip(xs - 1, 0, W_RAW - 1).astype(np.double)
    lv = ys.astype(np.double)
    np.stack([lu.ravel(), lv.ravel()]).tofile(
        models / "stereo_narrow_left_distortion_lut.bin"
    )

    # Bayer (GBRG) frames: constant gray so demosaic is exactly uniform.
    rng = np.random.default_rng(0)
    for t in TS:
        bayer = np.full((H_RAW, W_RAW), 128, np.uint8)
        Image.fromarray(bayer, mode="L").save(img_dir / f"{t}.png")

    # vo.csv: constant forward motion of 0.5 m per step along SDK x.
    lines = ["source_timestamp,destination_timestamp,x,y,z,roll,pitch,yaw"]
    for t0, t1 in zip(TS[:-1], TS[1:]):
        lines.append(f"{t1},{t0},0.5,0.0,0.0,0.0,0.0,0.0")
    (root / "vo.csv").write_text("\n".join(lines) + "\n")

    # Identity extrinsics for camera and lidar.
    (extr / "stereo_narrow_left.txt").write_text("0 0 0 0 0 0\n")
    (extr / "ldmrs.txt").write_text("0 0 0 0 0 0\n")

    # One LiDAR scan at the middle timestamp: a point 10 m in front of the
    # (identity-extrinsic) camera at the principal axis.
    scan = np.array([[0.0, 0.0, 10.0]], np.double)  # (N, 3) x,y,z rows
    scan.ravel().tofile(lidar / f"{TS[2]}.bin")
    return root


def test_camera_model_lut_undistort(fixture_root):
    cm = CameraModel(fixture_root / "models", str(fixture_root / "stereo" / "centre"))
    assert cm.camera == "stereo_narrow_left"
    assert cm.focal_length == (FX, FY)
    img = np.arange(H_RAW * W_RAW, dtype=np.float64).reshape(H_RAW, W_RAW)
    out = cm.undistort(img)
    # LUT samples from x-1: out[:, 1:] == img[:, :-1].
    np.testing.assert_allclose(out[:, 1:], img[:, :-1])


def test_load_image_demosaics_bayer(fixture_root):
    cm = CameraModel(fixture_root / "models", str(fixture_root / "stereo" / "centre"))
    img = load_image(
        fixture_root / "stereo" / "centre" / f"{TS[0]}.png", cm
    )
    assert img.shape == (H_RAW, W_RAW, 3)
    # Constant Bayer input -> constant RGB output.
    np.testing.assert_allclose(img, 128.0)


def test_vo_pose_integration(fixture_root):
    poses = interpolate_vo_poses(fixture_root / "vo.csv", TS, TS[0])
    # Pose at TS[2] is two 0.5 m steps from the origin along SDK x.
    np.testing.assert_allclose(poses[0], np.eye(4), atol=1e-9)
    np.testing.assert_allclose(poses[2][:3, 3], [1.0, 0.0, 0.0], atol=1e-9)
    np.testing.assert_allclose(poses[2][:3, :3], np.eye(3), atol=1e-9)


def test_dataset_sample_contract_and_lidar_projection(fixture_root):
    ds = OxfordRobotCarDataset(
        sequence_folders=[str(fixture_root / "stereo" / "centre")],
        pose_files=[str(fixture_root / "vo.csv")],
        lidar_folders=[str(fixture_root / "ldmrs")],
        model_folder=str(fixture_root / "models"),
        extrinsics_folder=str(fixture_root / "extrinsics"),
        frame_count=2,
        scale=SCALE,
        cutout=(0, 0, 0, 0),
        lidar_timestamp_range=0.05,
    )
    assert len(ds) == len(TS) - 2
    s = ds[1]  # keyframe at TS[2] (offset 1), where the LiDAR scan sits
    h, w = int(H_RAW * SCALE), int(W_RAW * SCALE)
    assert s["keyframe"].shape == (h, w, 3)
    assert s["frames"].shape == (2, h, w, 3)
    assert s["poses"].shape == (2, 4, 4)
    assert -0.5 <= s["keyframe"].min() and s["keyframe"].max() <= 0.5
    # Intrinsics rescaled by the image scale.
    assert s["keyframe_intrinsics"][0, 0] == pytest.approx(FX * SCALE)

    # The planted point: 10 m ahead on the principal axis. The scan is
    # stored in world coords == camera coords here (identity extrinsics,
    # keyframe at the scan timestamp), so it lands at the principal point
    # with inverse depth 0.1.
    target = s["target"][..., 0]
    nz = np.argwhere(target > 0)
    assert len(nz) == 1, f"expected exactly the planted return, got {len(nz)}"
    v, u = nz[0]
    assert abs(v - CY * SCALE) <= 1 and abs(u - CX * SCALE) <= 1
    assert target[v, u] == pytest.approx(0.1, rel=1e-3)

    # Poses: the two source frames bracket the keyframe 0.5 m apart
    # (cam-to-world after the SDK axis swap; translation magnitude survives).
    d = np.linalg.norm(s["poses"][0][:3, 3] - s["poses"][1][:3, 3])
    assert d == pytest.approx(1.0, rel=1e-6)
