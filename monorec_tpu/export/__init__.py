from monorec_tpu.export.ply import PLYWriter
from monorec_tpu.export.pointcloud import pointcloud_masks, export_pointcloud

__all__ = ["PLYWriter", "pointcloud_masks", "export_pointcloud"]
