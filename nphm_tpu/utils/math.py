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


def inv3x3(m, eps: float = 0.0):
    """Closed-form batched 3x3 inverse via the adjugate.

    ``jnp.linalg.inv`` lowers to a general LU path that costs ~5 ms per
    [5000, 3, 3] batch on a v5e — several orders of magnitude more than
    these nine cofactor FMAs.  m: [..., 3, 3].
    """
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d

    det = a * A + b * D + c * G
    inv_det = 1.0 / (det + eps) if eps else 1.0 / det
    adj = jnp.stack(
        [
            jnp.stack([A, B, C], axis=-1),
            jnp.stack([D, E, F], axis=-1),
            jnp.stack([G, H, I], axis=-1),
        ],
        axis=-2,
    )
    return adj * inv_det[..., None, None]
