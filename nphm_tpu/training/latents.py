"""Auto-decoder latent tables.

Replicates the reference's latent machinery (training.py:29-55) in JAX:

- ``torch.nn.Embedding(n, d, max_norm=1.0)``: rows accessed in a forward pass
  are renormed in place to norm <= max_norm *before* lookup.  Here:
  ``renorm_rows`` projects the touched rows and writes them back each step.
- ``torch.optim.SparseAdam``: one global step counter per table, but first/
  second moments are updated ONLY for rows that received gradient this step;
  bias correction uses the global step.  ``row_adam_update`` reproduces this
  with a dense scatter mask (exact for the dense-equivalent gradient).
- ``clip_grad_norm_`` over the (coalesced) sparse gradient == global-norm clip
  of the dense gradient.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class LatentTable(NamedTuple):
    table: jnp.ndarray  # [n, d]
    max_norm: Optional[float]


class RowAdamState(NamedTuple):
    step: jnp.ndarray  # scalar int32
    exp_avg: jnp.ndarray  # [n, d]
    exp_avg_sq: jnp.ndarray  # [n, d]


def init_latent_table(
    key, n: int, dim: int, std: float, max_norm: Optional[float] = 1.0
) -> LatentTable:
    """N(0, std) init (reference: std = 0.1/sqrt(dim) for identity tables,
    0.01 for expression tables)."""
    return LatentTable(jax.random.normal(key, (n, dim)) * std, max_norm)


def renorm_rows(table: jnp.ndarray, idx: jnp.ndarray, max_norm: float) -> jnp.ndarray:
    """Project rows ``idx`` to norm <= max_norm (torch Embedding max_norm
    semantics, applied at access time)."""
    rows = table[idx]
    norms = jnp.linalg.norm(rows, axis=-1, keepdims=True)
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(norms, 1e-12))
    return table.at[idx].set(rows * scale)


def row_adam_init(table: jnp.ndarray) -> RowAdamState:
    return RowAdamState(
        jnp.zeros((), jnp.int32), jnp.zeros_like(table), jnp.zeros_like(table)
    )


def row_adam_update(
    table: jnp.ndarray,
    grads: jnp.ndarray,
    state: RowAdamState,
    idx: jnp.ndarray,
    lr,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
):
    """SparseAdam step: moments/updates only on rows present in ``idx``.

    grads: dense [n, d] gradient (zeros on untouched rows — exactly what
    autodiff through a gather produces).
    """
    touched = jnp.zeros(table.shape[0], bool).at[idx].set(True)[:, None]
    step = state.step + 1
    exp_avg = jnp.where(touched, b1 * state.exp_avg + (1 - b1) * grads, state.exp_avg)
    exp_avg_sq = jnp.where(
        touched, b2 * state.exp_avg_sq + (1 - b2) * grads * grads, state.exp_avg_sq
    )
    bc1 = 1 - b1 ** step.astype(jnp.float32)
    bc2 = 1 - b2 ** step.astype(jnp.float32)
    denom = jnp.sqrt(exp_avg_sq / bc2) + eps
    update = jnp.where(touched, lr * (exp_avg / bc1) / denom, 0.0)
    return table - update, RowAdamState(step, exp_avg, exp_avg_sq)


def clip_global_norm(tree, max_norm: float):
    """torch.nn.utils.clip_grad_norm_ semantics on a pytree."""
    leaves = jax.tree_util.tree_leaves(tree)
    total = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in leaves))
    scale = jnp.minimum(1.0, max_norm / (total + 1e-6))
    return jax.tree.map(lambda g: g * scale, tree), total
