"""Shared environment builder for tests that spawn CLI subprocesses.

One load-bearing recipe, kept in one place: a subprocess cannot opt out of
the TPU backend via ``JAX_PLATFORMS=cpu`` alone, because the execution
environment injects a ``sitecustomize`` (via ``PYTHONPATH``) that re-pins
jax to the TPU.  Prepending ``tests/_cpu_site`` shadows that module so the
env var works again; omitting it silently runs CLI tests on the real TPU
(slow, relay-dependent, and tiny-dim Pallas variants fail Mosaic compile).
"""

import os

_TESTS = os.path.dirname(os.path.abspath(__file__))


def cpu_subprocess_env(extra=None, xla_flags=None):
    """``os.environ`` copy genuinely pinned to the CPU jax platform.

    extra: dict of additional variables (e.g. ``dummy_env(root)``).
    xla_flags: optional XLA_FLAGS value (e.g. a virtual-device count).
    """
    env = dict(os.environ)
    if extra:
        env.update(extra)
    env["JAX_PLATFORMS"] = "cpu"
    if xla_flags is not None:
        env["XLA_FLAGS"] = xla_flags
    env["PYTHONPATH"] = os.path.join(_TESTS, "_cpu_site") + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""
    )
    return env
