from monorec_tpu.ops.sampling import bilinear_sample, grid_sample_nhwc
from monorec_tpu.ops.ssim import ssim
from monorec_tpu.ops.cost_volume import compute_cost_volume, CostVolumeConfig

__all__ = [
    "bilinear_sample",
    "grid_sample_nhwc",
    "ssim",
    "compute_cost_volume",
    "CostVolumeConfig",
]
