"""Framework-wide precision policy.

The rebuild has three mixed-precision knobs that all trade exact reference
parity for TPU throughput:

* ``MonoRecConfig.cv_warp_dtype`` — source-image dtype inside the fused
  Pallas cost-volume kernel;
* ``MonoRecConfig.compute_dtype`` — conv compute dtype of the Mask/Depth
  U-Nets (params stay f32);
* the loss-reprojection warp dtype (``losses/common.py::_warp_by_depth``).

One policy selects all three so a run is either exact end-to-end or the
serving/training mixed-precision configuration end-to-end — there is no
half-exact default (the reference, ``model/monorec/monorec_model.py`` and
``model/loss_functions/common_losses.py``, is f32 everywhere; "exact" is the
parity configuration).

Select via the top-level ``"precision"`` key of a JSON config ("exact" |
"serving", default "exact") or programmatically with ``set_precision``.
The policy is read at trace time — set it BEFORE building jitted train
steps. A jitted function keeps the dtypes it was traced with forever
(changing the policy does not retrace it), so ``set_precision`` warns with
a ``PrecisionPolicyWarning`` when the previous policy was already consumed
by a trace: everything built before the call must be rebuilt to pick up
the new policy.
"""

from __future__ import annotations

import warnings
from typing import Dict, Optional

import jax.numpy as jnp


class PrecisionPolicyWarning(UserWarning):
    """Raised when the precision policy changes after being consumed at
    trace time — previously built jitted functions keep the old dtypes."""

POLICIES: Dict[str, Dict[str, str]] = {
    # bit-faithful to the reference: f32 everywhere
    "exact": {
        "cv_warp_dtype": "float32",
        "compute_dtype": "float32",
        "loss_warp_dtype": "float32",
    },
    # recommended TPU configuration: bf16 warps + bf16 U-Net conv compute
    # (params/grads/losses stay f32). Measured golden-sample abs_rel drift
    # is ≪ the 1% parity budget (see PARITY.md).
    "serving": {
        "cv_warp_dtype": "bfloat16",
        "compute_dtype": "bfloat16",
        "loss_warp_dtype": "bfloat16",
    },
}

_current = "exact"
# Name of the policy last consumed at trace/construction time (by
# loss_warp_dtype inside a trace or apply_to_model_kwargs at model build).
# None until first consumption, and reset by set_precision: code built
# AFTER a set_precision call correctly sees the new policy; the warning is
# about code built BEFORE it.
_consumed: Optional[str] = None


def set_precision(name: str, expect_rebuild: bool = False) -> None:
    """Select the process-wide precision policy.

    ``expect_rebuild=True`` suppresses the ``PrecisionPolicyWarning`` for
    callers that rebuild every model / jitted step after the switch (e.g.
    benchmark or A/B harnesses that construct everything per policy) — the
    stale-trace warning is about code built BEFORE the call, which such
    callers do not keep.
    """
    global _current, _consumed
    if name not in POLICIES:
        raise ValueError(f"unknown precision policy {name!r}; one of {sorted(POLICIES)}")
    if _consumed is not None and name != _current and not expect_rebuild:
        warnings.warn(
            f"set_precision({name!r}): the {_current!r} policy was already "
            "consumed at trace time in this process. Jitted functions and "
            "models built before this call keep their traced dtypes (jit "
            "does not retrace on policy changes) — rebuild them to pick up "
            f"the {name!r} policy.",
            PrecisionPolicyWarning,
            stacklevel=2,
        )
    if name != _current:
        # Code built from here on sees the new policy; consumption memory
        # restarts. A same-name call changes nothing, so the memory (that
        # something was built under this policy) is kept.
        _consumed = None
    _current = name


def precision_policy() -> str:
    return _current


def loss_warp_dtype():
    """Kernel-path source dtype for the loss reprojection warps."""
    global _consumed
    _consumed = _current
    return (
        jnp.bfloat16
        if POLICIES[_current]["loss_warp_dtype"] == "bfloat16"
        else jnp.float32
    )


def apply_to_model_kwargs(kwargs: Dict) -> Dict:
    """Fill cv_warp_dtype / compute_dtype from the active policy unless the
    config sets them explicitly (explicit per-knob values win, so a config
    can still pin e.g. an exact cost volume under the serving policy)."""
    global _consumed
    _consumed = _current
    policy = POLICIES[_current]
    out = dict(kwargs)
    out.setdefault("cv_warp_dtype", policy["cv_warp_dtype"])
    out.setdefault("compute_dtype", policy["compute_dtype"])
    return out
