"""Force the CPU platform in test subprocesses.

The execution environment injects its own ``sitecustomize`` via
``PYTHONPATH`` which registers a TPU backend and pins ``jax_platforms`` to
it, overriding a ``JAX_PLATFORMS=cpu`` set in the subprocess environment
(verified: ``env JAX_PLATFORMS=cpu python`` still reports backend "tpu").
Tests that spawn CLI subprocesses prepend THIS directory to ``PYTHONPATH``
so this module shadows that one; with no TPU registration the subprocess's
``JAX_PLATFORMS`` env var takes effect normally.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
