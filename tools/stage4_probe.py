"""A/B probe: stage-4 train-step throughput under formulation variants.

Measures, on the real chip, each avenue of the stage-4 fusion work
(one fused mono+stereo CV launch; one 2B-batch depth decode; the CV
kernel's depth-chunk size) separately and combined, so wins land with a
number attached and non-wins go on the record (MEASURED.md / README
roadmap). Run: ``python tools/stage4_probe.py [batch]``.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_tpu_cache",
    ),
)


def main():
    import bench

    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 8

    variants = [
        ("baseline_r4", {"joint_cv": False, "joint_depth_decode": False}, None),
        ("joint_cv", {"joint_cv": True, "joint_depth_decode": False}, None),
        ("joint_decode", {"joint_cv": False, "joint_depth_decode": True}, None),
        ("both", {"joint_cv": True, "joint_depth_decode": True}, None),
        ("both_dchunk8", {"joint_cv": True, "joint_depth_decode": True}, "8"),
        ("baseline_dchunk8", {"joint_cv": False, "joint_depth_decode": False}, "8"),
    ]
    results = {}
    for name, overrides, dchunk in variants:
        if dchunk is None:
            os.environ.pop("MONOREC_CV_DCHUNK", None)
        else:
            os.environ["MONOREC_CV_DCHUNK"] = dchunk
        t0 = time.time()
        med, spread = bench._bench_train_step_stage4(batch_size, overrides)
        results[name] = {"kf_per_sec": round(med, 2), "spread": round(spread, 2)}
        print(
            f"[probe] {name}: {med:.2f} kf/s (spread {spread:.2f}, "
            f"{time.time() - t0:.0f}s incl compile)",
            file=sys.stderr, flush=True,
        )
    os.environ.pop("MONOREC_CV_DCHUNK", None)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
