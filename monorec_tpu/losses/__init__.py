from monorec_tpu.losses.monorec_losses import (
    depth_loss,
    mask_loss,
    mask_refinement_loss,
    depth_refinement_loss,
    depth_aux_mask_loss,
    LOSSES,
)

__all__ = [
    "depth_loss",
    "mask_loss",
    "mask_refinement_loss",
    "depth_refinement_loss",
    "depth_aux_mask_loss",
    "LOSSES",
]
