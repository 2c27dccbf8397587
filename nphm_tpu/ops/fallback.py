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


# A crashed TPU worker poisons the whole in-process backend: every later
# dispatch — including retries of a SMALLER program — fails instantly with
# the same UNAVAILABLE error until the runtime is re-initialized (observed
# r04: an S=8 NPM fit crashed the worker and the bisection ladder burned
# all its retries against the dead backend).  The chip itself recovers on
# its own; a NEW process always works.  ``recover_backend`` gives the
# CURRENT process that fresh-process behavior: drop the cached runtime +
# compiled programs and re-probe until the relay hands back a live backend.
_BACKEND_CRASH_SIGNATURES = (
    "crashed or restarted",   # "TPU worker process crashed or restarted"
    "unavailable",            # jax UNAVAILABLE runtime errors
)


def backend_crash_error(exc: BaseException) -> bool:
    """True iff ``exc`` looks like a dead/crashed TPU backend (not a
    program bug): retrying the same Python call is useless until
    ``recover_backend`` succeeds."""
    blob = f"{type(exc).__name__}: {exc}".lower()
    return any(sig in blob for sig in _BACKEND_CRASH_SIGNATURES)


def recover_backend(probe_timeout_s: float = 120.0, verbose: bool = True) -> bool:
    """Best-effort in-process TPU backend recovery after a worker crash.

    Clears jax's cached backends + compiled programs and probes with a tiny
    device computation (run in a watchdog thread: a DOWN relay blocks
    forever inside backend init — .claude/skills/verify/SKILL.md).  Retries
    with backoff for ~3 minutes.  Returns True when a probe computation
    round-trips.  All device arrays created before the crash are dead
    regardless — callers must rematerialize inputs from host copies.
    """
    import threading
    import time as _time

    import jax
    import numpy as _np

    def _probe() -> bool:
        ok = {}

        def body():
            try:
                x = jax.jit(lambda a: a + 1)(_np.float32(1))
                ok["v"] = float(_np.asarray(x)) == 2.0
            except Exception:  # noqa: BLE001 — any failure = still dead
                ok["v"] = False

        t = threading.Thread(target=body, daemon=True)
        t.start()
        t.join(probe_timeout_s)
        return bool(ok.get("v"))

    for wait in (2.0, 10.0, 30.0, 60.0, 90.0):
        try:
            jax.clear_caches()
        except Exception:  # noqa: BLE001
            pass
        try:
            jax.clear_backends()
        except Exception:  # noqa: BLE001
            pass
        _time.sleep(wait)
        if _probe():
            if verbose:
                print("[recover_backend] TPU backend re-initialized")
            return True
        if verbose:
            print(f"[recover_backend] backend still down after {wait:.0f}s wait")
    return False
