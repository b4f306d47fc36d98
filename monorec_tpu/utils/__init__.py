from monorec_tpu.utils.core import (
    mask_mean,
    masked_where,
    preprocess_roi,
    get_absolute_depth,
    get_positive_depth,
    get_mask,
    median_scaling,
    ValueFader,
    Timer,
    operator_on_dict,
)

__all__ = [
    "mask_mean",
    "masked_where",
    "preprocess_roi",
    "get_absolute_depth",
    "get_positive_depth",
    "get_mask",
    "median_scaling",
    "ValueFader",
    "Timer",
    "operator_on_dict",
]
