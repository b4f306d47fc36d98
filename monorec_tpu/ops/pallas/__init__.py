from monorec_tpu.ops.pallas.cv_kernel import plane_sweep_sad
from monorec_tpu.ops.pallas.warp_kernel import warp_plane_sweep

__all__ = ["plane_sweep_sad", "warp_plane_sweep"]
