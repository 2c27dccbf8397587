"""Test configuration: run everything on a virtual 8-device CPU mesh.

TPU hardware is not required for tests; multi-chip sharding is validated on
XLA's host-platform virtual devices, the standard JAX substitute for a real
slice.  The execution environment may pre-import jax with a TPU platform via
sitecustomize, so we override through jax.config (which works as long as no
backend has been initialized yet) rather than env vars alone.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
