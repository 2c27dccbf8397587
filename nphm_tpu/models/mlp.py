"""Shared MLP building blocks: initializers and activations.

All decoders in this package are *pure functions* over parameter pytrees
(plain dicts of jnp arrays).  Initialization reproduces the distributions the
reference training recipe assumes (PyTorch's default Linear init and the
DeepSDF geometric init) so that training dynamics match; the forward math is
written TPU-first.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def torch_linear_init(key, in_features: int, out_features: int, dtype=jnp.float32):
    """U(+-1/sqrt(fan_in)) weight and bias — the PyTorch nn.Linear default.

    (kaiming_uniform with a=sqrt(5) collapses to U(+-1/sqrt(fan_in));
    cf. reference EnsembledDeepSDF.py:28-35 which relies on this default.)
    """
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_features) if in_features > 0 else 0.0
    w = jax.random.uniform(kw, (out_features, in_features), dtype, -bound, bound)
    b = jax.random.uniform(kb, (out_features,), dtype, -bound, bound)
    return {"w": w, "b": b}


def geometric_last_layer_init(
    key, in_features: int, out_features: int, radius: float, dtype=jnp.float32
):
    """DeepSDF geometric init: the net starts out as an approximate sphere SDF.

    Weights ~ N(sqrt(pi)/sqrt(fan_in), 1e-5), bias = -radius
    (behavioral spec: reference deepSDF.py:49-54).
    """
    w = jnp.sqrt(jnp.pi / in_features) + 1e-5 * jax.random.normal(
        key, (out_features, in_features), dtype
    )
    b = jnp.full((out_features,), -radius, dtype)
    return {"w": w, "b": b}


def linear(params, x):
    """y = x @ W^T + b over the last axis."""
    return jnp.einsum("...i,oi->...o", x, params["w"]) + params["b"]


def softplus_beta(x, beta: float = 100.0, threshold: float = 20.0):
    """Softplus(beta*x)/beta with the linear region torch uses for beta*x>20."""
    bx = beta * x
    return jnp.where(bx > threshold, x, jax.nn.softplus(bx) / beta)


def mlp_dims(d_in: int, hidden: int, n_layers: int, d_out: int):
    """Per-layer (in, out) dims of a DeepSDF-style trunk with one skip.

    The skip re-concatenates the input before layer ``n_layers // 2``; the
    layer feeding the skip therefore shrinks its output by d_in so the
    concatenated width stays ``hidden`` (reference deepSDF.py:29-44).
    """
    dims = [d_in] + [hidden] * n_layers + [d_out]
    skip_in = n_layers // 2
    shapes = []
    for layer in range(len(dims) - 1):
        out_d = dims[layer + 1] - d_in if layer + 1 == skip_in else dims[layer + 1]
        shapes.append((dims[layer], out_d))
    return shapes, skip_in


def positional_encoding(xyz, num_freq_bands: int | None):
    """[x, sin(2^k x), cos(2^k x)] band embedding (optional)."""
    if num_freq_bands is None:
        return xyz
    freqs = np.asarray([2.0**k for k in range(num_freq_bands)], dtype=np.float32)
    embeds = [xyz]
    for f in freqs:
        embeds.append(jnp.sin(xyz * f))
        embeds.append(jnp.cos(xyz * f))
    return jnp.concatenate(embeds, axis=-1)
