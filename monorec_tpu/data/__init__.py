from monorec_tpu.data.loader import DataLoader, DatasetWrapper
from monorec_tpu.data.cache import CachedDataset, build_cache
from monorec_tpu.data.kitti import KittiOdometryDataset
from monorec_tpu.data.synthetic import SyntheticSweepDataset

DATASETS = {
    "KittiOdometryDataset": KittiOdometryDataset,
    "SyntheticSweepDataset": SyntheticSweepDataset,
    "CachedDataset": CachedDataset,
}


def _register_extra():
    """Datasets with heavier optional deps are registered lazily."""
    from monorec_tpu.data.tum_rgbd import TUMRGBDDataset
    from monorec_tpu.data.tum_mono_vo import TUMMonoVODataset
    from monorec_tpu.data.robotcar import OxfordRobotCarDataset

    DATASETS.update(
        {
            "TUMRGBDDataset": TUMRGBDDataset,
            "TUMMonoVODataset": TUMMonoVODataset,
            "OxfordRobotCarDataset": OxfordRobotCarDataset,
        }
    )


__all__ = [
    "DataLoader",
    "DatasetWrapper",
    "KittiOdometryDataset",
    "SyntheticSweepDataset",
    "CachedDataset",
    "build_cache",
    "DATASETS",
]
