"""Small numeric helpers."""

from __future__ import annotations

import jax.numpy as jnp


def safe_l2norm(x, axis=-1, keepdims=False, eps: float = 1e-20):
    """L2 norm with a finite gradient at 0 (torch defines the subgradient of
    ||.|| at 0 as 0; naive jnp.linalg.norm backprops NaN there)."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims) + eps)


def sq_norm(x, axis=-1, keepdims=False):
    """||x||^2 without the norm->square round trip (NaN-free gradient)."""
    return jnp.sum(x * x, axis=axis, keepdims=keepdims)
