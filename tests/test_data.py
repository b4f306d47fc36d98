"""Dataset-contract tests: KITTI fixture + synthetic dataset + loader."""

from pathlib import Path

import numpy as np
import pytest

from monorec_tpu.data import (
    DataLoader,
    DatasetWrapper,
    KittiOdometryDataset,
    SyntheticSweepDataset,
)

FIXTURE = Path("/root/reference/example/data/kitti")


@pytest.fixture(scope="module")
def kitti():
    if not FIXTURE.exists():
        pytest.skip("KITTI fixture not available")
    return KittiOdometryDataset(
        str(FIXTURE), sequences=["07"], target_image_size=(256, 512), frame_count=2,
        depth_folder="image_depth_annotated", lidar_depth=True, dso_depth=False,
        use_dso_poses=True, custom_length=1000,
    )


def test_kitti_sample_contract(kitti):
    s = kitti[164]  # image 000169 (the reference golden sample)
    assert s["keyframe"].shape == (256, 512, 3)
    assert s["frames"].shape == (2, 256, 512, 3)
    assert s["poses"].shape == (2, 4, 4)
    assert s["target"].shape == (256, 512, 1)
    assert int(s["image_id"][0]) == 169
    # images normalized to [-0.5, 0.5]
    assert -0.5 <= s["keyframe"].min() and s["keyframe"].max() <= 0.5
    # target is inverse depth: valid pixels within plausible KITTI range
    valid = s["target"][s["target"] > 0]
    assert valid.size > 1000
    assert valid.max() <= 1.0 and valid.min() >= 1 / 200.0


def test_kitti_intrinsics_rescaled(kitti):
    k = kitti._intrinsics["07"]
    # Original: 1226x370, fx=707.09. Crop width = 370/0.5 = 740 -> scale 512/740.
    expected_fx = 707.0912 * 512 / 740
    np.testing.assert_allclose(k[0, 0], expected_fx, rtol=1e-3)
    assert k.shape == (4, 4) and k[2, 2] == 1 and k[3, 3] == 1


def test_kitti_poses_cam_to_world(kitti):
    s = kitti[164]
    # consecutive poses should be close (frame-to-frame motion < 3 m)
    d = np.linalg.norm(s["keyframe_pose"][:3, 3] - s["poses"][0][:3, 3])
    assert 0 < d < 3.0
    # rotation orthonormal
    r = s["keyframe_pose"][:3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-4)


def test_annotated_depth_scatter_matches_png(kitti):
    """Spot check: the scattered inverse depth equals 256/png at the source."""
    from PIL import Image

    png = np.asarray(
        Image.open(FIXTURE / "sequences/07/image_depth_annotated/000169.png"),
        np.float64,
    )
    s = kitti[164]
    tgt = s["target"][..., 0]
    # Count of valid pixels should be close to (cropped) png nonzero count.
    l, t, r, b = kitti._crop_boxes["07"]
    cropped = png[t:b, l:r]
    n_png = (cropped > 0).sum()
    n_tgt = (tgt > 0).sum()
    assert 0.5 * n_png <= n_tgt <= n_png  # collisions reduce count slightly
    # Median inverse depth should be preserved by scatter
    med_png = np.median(256.0 / cropped[cropped > 0])
    med_tgt = np.median(tgt[tgt > 0])
    np.testing.assert_allclose(med_tgt, med_png, rtol=0.1)


def test_dataloader_batching_and_split():
    ds = SyntheticSweepDataset(length=20, target_image_size=(16, 32))
    dl = DataLoader(ds, batch_size=4, shuffle=True, validation_split=0.25,
                    num_workers=2, device_put=False, seed=1)
    val = dl.split_validation()
    assert dl.n_samples == 15 and val.n_samples == 5
    batches = list(dl)
    assert len(batches) == 3  # 15 // 4 (drop_last)
    b = batches[0]
    assert b["keyframe"].shape == (4, 16, 32, 3)
    assert b["frames"].shape == (4, 2, 16, 32, 3)
    # fixed split seed: train/val disjoint
    assert set(dl.indices.tolist()).isdisjoint(set(val.indices.tolist()))


def test_dataset_wrapper():
    ds = SyntheticSweepDataset(length=20, target_image_size=(16, 32))
    w = DatasetWrapper(ds, start=4, end=14, every_nth=2)
    assert len(w) == 5
    np.testing.assert_array_equal(w[0]["image_id"], ds[4]["image_id"])
    np.testing.assert_array_equal(w[2]["image_id"], ds[8]["image_id"])


def test_color_jitter_deterministic_per_sample():
    from monorec_tpu.data.color_jitter import apply_color_jitter, sample_color_jitter

    rng = np.random.default_rng(0)
    p = sample_color_jitter(rng)
    img = rng.uniform(0, 1, (8, 8, 3)).astype(np.float32)
    a = apply_color_jitter(img, p)
    b = apply_color_jitter(img, p)
    np.testing.assert_array_equal(a, b)
    assert a.shape == img.shape and a.min() >= 0 and a.max() <= 1.0 + 1e-6
