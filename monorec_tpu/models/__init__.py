from monorec_tpu.models.monorec import MonoRec, MonoRecConfig

__all__ = ["MonoRec", "MonoRecConfig"]
