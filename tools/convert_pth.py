"""Shim: the converter lives in ``monorec_tpu.convert`` (importable by the
framework, e.g. for ImageNet encoder weight injection); this keeps the
documented ``python tools/convert_pth.py src dst`` entry point working."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from monorec_tpu.convert import (  # noqa: F401
    Converter,
    convert_state_dict,
    main,
)

if __name__ == "__main__":
    main()
