from monorec_tpu.losses.monorec_losses import (
    depth_loss,
    mask_loss,
    mask_refinement_loss,
    depth_refinement_loss,
    depth_aux_mask_loss,
    LOSSES,
)
from monorec_tpu.losses.perceptual import PerceptualError

__all__ = [
    "depth_loss",
    "mask_loss",
    "mask_refinement_loss",
    "depth_refinement_loss",
    "depth_aux_mask_loss",
    "LOSSES",
    "PerceptualError",
]
