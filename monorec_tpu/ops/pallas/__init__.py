from monorec_tpu.ops.pallas.warp_kernel import warp_plane_sweep

__all__ = ["warp_plane_sweep"]
