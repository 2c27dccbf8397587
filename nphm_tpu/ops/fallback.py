"""Classification of Pallas/Mosaic KERNEL-COMPILE failures vs runtime errors.

The fused kernels (ops/pallas_train.py, ops/pallas_ensemble.py) fail to
COMPILE for unusual architectures — e.g. tiny hidden dims hit a Mosaic
"only constant accumulators supported" error, and oversized tiles overflow
the statically allocated VMEM.  Those failures are safe (and correct) to
recover from by rebuilding the program on the plain-XLA path.

A genuine RUNTIME failure (HBM OOM, relay hiccup, TPU worker crash, NaN
guard) must NOT be swallowed by that fallback: replaying it — more slowly —
on XLA masks the real error, and in the trainers it would retry with
buffers already donated to the failed call, surfacing as a confusing
deleted-buffer error.  Callers therefore gate their fallback on
``kernel_compile_error`` and re-raise everything else.

Matched signatures (all observed through the remote-compile relay, which
wraps them in HTTP-500 text — hence substring matching on the message):

- "mosaic"             — "Mosaic failed to compile TPU kernel: ..."
- "pallas"             — pallas lowering errors name the pallas_call
- "memory space vmem"  — static VMEM overflow at program-build time
  (runtime OOM reports "memory space hbm" and is NOT matched)

Deliberately NOT matched (ADVICE r2): bare "compile" and bare "vmem" — a
runtime failure whose message merely mentions compilation or VMEM must
surface, not be silently replayed.
"""

from __future__ import annotations

_KERNEL_COMPILE_SIGNATURES = (
    "mosaic",
    "pallas",
    "memory space vmem",
)


def kernel_compile_error(exc: BaseException) -> bool:
    """True iff ``exc`` looks like a Pallas/Mosaic kernel-compile failure."""
    blob = f"{type(exc).__name__}: {exc}".lower()
    return any(sig in blob for sig in _KERNEL_COMPILE_SIGNATURES)
