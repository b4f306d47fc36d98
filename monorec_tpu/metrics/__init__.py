from monorec_tpu.metrics.depth_metrics import METRICS, get_metric

__all__ = ["METRICS", "get_metric"]
