"""Full-resolution end-to-end regression at the reference operating point.

The released ``monorec_depth_ref.pth`` is not downloadable in this
environment (zero egress), so this pins the *complete* pipeline — real KITTI
seq-07 fixture sample -> plane-sweep cost volume at 256x512/D=32 ->
MaskModule -> mask-attenuated DepthModule -> inverse depth — against the
independent torch oracle with converted weights, in both frameworks
(VERDICT r1 "Next" #3). When the real checkpoint becomes available the same
harness runs against it via tools/convert_pth.py.

Asserts: ``result`` and ``cv_mask`` agree between frameworks, and the
abs_rel each framework achieves vs the LiDAR ground truth agrees within the
1% relative budget of the north star (BASELINE.md).
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from convert_pth import convert_state_dict  # noqa: E402
from test_cost_volume import _torch_cost_volume  # noqa: E402
from torch_reference import MonoRecTorch  # noqa: E402

from monorec_tpu.data import KittiOdometryDataset  # noqa: E402
from monorec_tpu.geometry import depth_hypotheses  # noqa: E402
from monorec_tpu.models import MonoRec, MonoRecConfig  # noqa: E402

FIXTURE = Path("/root/reference/example/data/kitti")
D = 32
LO, HI = 0.0025, 0.33  # inv_depth_min_max = (0.33, 0.0025)


def _abs_rel(inv_depth_pred: np.ndarray, inv_depth_gt: np.ndarray) -> float:
    """abs_rel on GT-valid pixels, depths clamped to 80 m (eval protocol)."""
    valid = inv_depth_gt > 0
    pred = np.clip(1.0 / np.maximum(inv_depth_pred, 1e-9), 0, 80.0)
    gt = np.clip(1.0 / inv_depth_gt[valid], 0, 80.0)
    return float(np.mean(np.abs(pred[valid] - gt) / gt))


@pytest.mark.slow
def test_full_pipeline_matches_torch_oracle_at_full_resolution():
    if not FIXTURE.exists():
        pytest.skip("KITTI fixture not available")
    dataset = KittiOdometryDataset(
        str(FIXTURE), sequences=["07"], target_image_size=(256, 512),
        frame_count=2, depth_folder="image_depth_annotated", lidar_depth=True,
        dso_depth=False, use_dso_poses=True, custom_length=1000,
    )
    sample = dataset[164]  # image 000169, the reference golden sample
    batch = {k: np.asarray(v)[None] for k, v in sample.items()}

    torch.manual_seed(0)
    tmodel = MonoRecTorch(depth_steps=D).eval()
    for m in tmodel.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.05)
            m.running_var.uniform_(0.5, 1.5)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params, batch_stats, unused = convert_state_dict(sd)
    assert not unused

    # --- JAX: one full forward (CV -> mask -> attenuate -> depth) ---------
    model = MonoRec(
        MonoRecConfig(inv_depth_min_max=(HI, LO), cv_depth_steps=D)
    )
    out = jax.jit(lambda v, b: model.apply(v, b, False))(
        {"params": params, "batch_stats": batch_stats}, batch
    )
    result_j = np.asarray(out["result"][0, ..., 0])
    mask_j = np.asarray(out["cv_mask"][0, ..., 0])

    # --- torch oracle: same pipeline from the same sample -----------------
    with torch.no_grad():
        kf = torch.from_numpy(batch["keyframe"][0]).permute(2, 0, 1)
        depths = torch.from_numpy(np.asarray(depth_hypotheses(LO, HI, D)))
        fused_t, sfcv_t = _torch_cost_volume(
            kf,
            torch.from_numpy(batch["keyframe_intrinsics"][0]),
            torch.from_numpy(batch["keyframe_pose"][0]),
            [
                torch.from_numpy(batch["frames"][0, i]).permute(2, 0, 1)
                for i in range(2)
            ],
            [torch.from_numpy(batch["intrinsics"][0, i]) for i in range(2)],
            [torch.from_numpy(batch["poses"][0, i]) for i in range(2)],
            depths,
        )  # fused (D,H,W); sfcv (F,D,H,W)
        feats_t = tmodel._feature_extractor(kf.unsqueeze(0) + 0.5)
        mask_t = tmodel.att_module(
            [sfcv_t[i].unsqueeze(0) for i in range(2)], feats_t
        )
        cv_att = fused_t.unsqueeze(0) * (1.0 - mask_t)
        preds_t = tmodel.depth_module(cv_att, kf.unsqueeze(0), feats_t)
        result_t = ((1 - preds_t[0]) * LO + preds_t[0] * HI)[0, 0].numpy()
        mask_t = mask_t[0, 0].numpy()

    # Framework agreement on the golden sample at the real operating point.
    np.testing.assert_allclose(mask_j, mask_t, atol=5e-3)
    np.testing.assert_allclose(result_j, result_t, atol=5e-3 * HI)

    # abs_rel vs LiDAR GT: within the 1% relative budget of each other.
    gt = np.asarray(batch["target"][0, ..., 0])
    ar_j = _abs_rel(result_j, gt)
    ar_t = _abs_rel(result_t, gt)
    assert abs(ar_j - ar_t) <= 0.01 * max(ar_t, 1e-6), (ar_j, ar_t)
