"""Field calculus for implicit decoders.

Replaces the reference's autograd helpers (``src/NPHM/models/diff_operators.py``)
with JAX transforms.  All fields here are *point-wise*: the value at point i
depends only on x_i, so per-point spatial gradients are one reverse pass of a
summed scalar, and 3x3 Jacobians are three forward (JVP) passes — both fully
compatible with outer differentiation (grad-of-grad for the eikonal loss).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def spatial_gradient(field_fn, xyz):
    """Per-point gradient of a scalar field.

    field_fn: xyz [..., N, 3] -> values [..., N, 1] (or [..., N]).
    Returns [..., N, 3].  Differentiable (double backprop) — the equivalent of
    the reference ``gradient(..., create_graph=True)`` (diff_operators.py:69-79).
    """

    def summed(x):
        return jnp.sum(field_fn(x))

    return jax.grad(summed)(xyz)


def value_and_spatial_gradient(field_fn, xyz):
    """(field values, per-point gradients) in one combined pass."""
    grads = spatial_gradient(field_fn, xyz)
    return field_fn(xyz), grads


def point_jacobian(vector_fn, xyz):
    """Per-point 3x3 Jacobian of a point-wise R^3 -> R^3 map.

    vector_fn: xyz [..., N, 3] -> [..., N, 3].
    Returns J [..., N, 3, 3] with J[..., i, j] = d out_i / d x_j — the same
    layout as the reference ``jac`` (diff_operators.py:26-54), computed with
    three JVPs instead of three VJPs.
    """
    eye = jnp.eye(3, dtype=xyz.dtype)
    cols = []
    for j in range(3):
        tangent = jnp.broadcast_to(eye[j], xyz.shape)
        _, col = jax.jvp(vector_fn, (xyz,), (tangent,))
        cols.append(col)
    return jnp.stack(cols, axis=-1)


def warp_jacobian(deform_fn, xyz):
    """Jacobian of the forward warp x -> x + delta(x)."""

    def warp(x):
        return x + deform_fn(x)

    return point_jacobian(warp, xyz)


def point_hessian(field_fn, xyz):
    """Per-point Hessian of a point-wise field.

    field_fn: xyz [..., N, 3] -> values [..., N, C] (or [..., N]).
    Returns H [..., N, C, 3, 3] with H[..., c, i, j] = d^2 f_c / dx_i dx_j —
    the layout of the reference ``hessian`` (diff_operators.py:5-24), minus
    its NaN status flag (JAX debugging uses jax.debug_nans).  Computed as
    forward-over-reverse: three JVPs of the per-point gradient.
    """

    n_channels = field_fn(xyz).shape
    n_channels = 1 if n_channels == xyz.shape[:-1] else n_channels[-1]

    def grads(x):
        # [..., N, C, 3] per-channel spatial gradients
        cols = [
            spatial_gradient(
                lambda q, i=i: jnp.reshape(
                    field_fn(q), q.shape[:-1] + (n_channels,)
                )[..., i],
                x,
            )
            for i in range(n_channels)
        ]
        return jnp.stack(cols, axis=-2)

    eye = jnp.eye(3, dtype=xyz.dtype)
    cols = []
    for j in range(3):
        tangent = jnp.broadcast_to(eye[j], xyz.shape)
        _, col = jax.jvp(grads, (xyz,), (tangent,))
        cols.append(col)
    return jnp.stack(cols, axis=-1)  # [..., N, C, 3, 3]


def divergence(vector_fn, xyz):
    """Per-point divergence of a point-wise R^3 -> R^3 field
    (reference diff_operators.py:62-66): sum of Jacobian diagonal.
    Returns [..., N, 1]."""
    J = point_jacobian(vector_fn, xyz)
    return jnp.trace(J, axis1=-2, axis2=-1)[..., None]


def laplace(field_fn, xyz):
    """Per-point Laplacian of a scalar field (reference
    diff_operators.py:57-59): divergence of the gradient.  Returns
    [..., N, 1]."""

    def grad_field(x):
        return spatial_gradient(field_fn, x)

    return divergence(grad_field, xyz)
