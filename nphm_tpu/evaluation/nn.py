"""Device (TPU) brute-force nearest neighbors for point-cloud metrics.

The reference keeps NN queries on the host (scipy cKDTree,
``src/NPHM/evaluation/metrics.py:2,180``).  At the protocol's 250k-point
clouds that is ~19 s per bidirectional evaluation on one host core — the
dominant cost of the eval phase.  On a TPU the same query is a batched
matmul: ``d2 = |q|^2 + |r|^2 - 2 q.r^T`` tiled over the MXU, ~0.7 s
end-to-end including the relay transfers (SURVEY.md 2.2 sanctions the
brute-force device path explicitly).

Exactness: the expansion form is ill-conditioned in f32 for points much
closer than the cloud radius, so the kernel takes k=8 candidates by
expansion distance (``lax.approx_max_k`` at recall 0.99, HIGHEST-precision
matmul, centroid-shifted coordinates) and re-computes exact difference-based
distances on the candidates only; the true NN would have to be missed by the
approximate reduction AND beaten by >= k spurious candidates inside the
~1e-3 mm^2 error window.  Measured against scipy at 250k x 250k: max |d|
deviation 9e-6 mm; the CPU-suite parity test asserts index-exact agreement
on random clouds.

Compiled runners are cached per (n_query, n_ref, chunk) — rebuilding a
@jax.jit closure per call would recompile every time (CLAUDE.md).
"""

from __future__ import annotations

import functools

import numpy as np

_K = 8  # refine candidates
_CHUNK = 2048  # query rows per matmul tile: chunk x n_ref f32 lives in HBM
_SENTINEL = 1.0e6  # padded ref points land here: never the argmin


def _pad_rows(a: np.ndarray, n: int, value: float) -> np.ndarray:
    if len(a) == n:
        return a
    pad = np.full((n - len(a), a.shape[1]), value, a.dtype)
    return np.concatenate([a, pad], axis=0)


@functools.lru_cache(maxsize=16)
def _directed_nn_fn(n_chunks: int, chunk: int, m_pad: int, k: int):
    """One-direction NN: query [n_chunks, chunk, 3] vs ref [m_pad, 3]."""
    import jax
    import jax.numpy as jnp

    def one_chunk(q, ref, rn):
        # q: [chunk, 3], ref: [m_pad, 3], rn: [m_pad]
        qn = jnp.sum(q * q, axis=-1, keepdims=True)  # [chunk, 1]
        d2 = qn + rn[None, :] - 2.0 * jnp.dot(
            q, ref.T, precision=jax.lax.Precision.HIGHEST
        )
        # approx_max_k: TPU-native partial reduction — measured 1.0 s vs
        # 2.9 s steady and 14 s vs 119 s compile against exact lax.top_k at
        # 250k x 250k; the k-candidate exact refine below absorbs both the
        # 0.99 recall and the f32 expansion error (parity test: exact).
        _, cand = jax.lax.approx_max_k(-d2, k, recall_target=0.99)
        diff = q[:, None, :] - ref[cand]  # exact refine on candidates
        d2e = jnp.sum(diff * diff, axis=-1)  # [chunk, k]
        j = jnp.argmin(d2e, axis=-1)
        rows = jnp.arange(q.shape[0])
        return jnp.sqrt(d2e[rows, j]), cand[rows, j]

    def run(q_chunks, ref):
        rn = jnp.sum(ref * ref, axis=-1)
        dist, idx = jax.lax.map(
            lambda q: one_chunk(q, ref, rn), q_chunks
        )
        return dist.reshape(-1), idx.reshape(-1)

    return jax.jit(run)


def _device_directed(query: np.ndarray, ref: np.ndarray, chunk: int = _CHUNK):
    """NN distances+indices from each query point to the ref cloud, on the
    default JAX device.  Returns float64 dist, int64 idx (scipy-shaped)."""
    import jax.numpy as jnp

    query = np.ascontiguousarray(query, np.float32)
    ref = np.ascontiguousarray(ref, np.float32)
    shift = ref.mean(axis=0, keepdims=True)  # conditioning: shrink |coords|
    q = query - shift
    r = ref - shift

    m_pad = -(-len(r) // 256) * 256
    r = _pad_rows(r, m_pad, _SENTINEL)
    n_pad = -(-len(q) // chunk) * chunk
    q = _pad_rows(q, n_pad, 0.0).reshape(n_pad // chunk, chunk, 3)

    fn = _directed_nn_fn(n_pad // chunk, chunk, m_pad, _K)
    dist, idx = fn(jnp.asarray(q), jnp.asarray(r))
    dist = np.asarray(dist)[: len(query)].astype(np.float64)
    idx = np.asarray(idx)[: len(query)].astype(np.int64)
    return dist, idx


def _use_device(n_query: int, n_ref: int) -> bool:
    """Device path pays off only when the host KDTree would be slow AND a
    real accelerator is attached (on CPU-jax the matmul is the slow path).

    Threshold calibration (one v5e through the axon relay): at 25k x 25k
    scipy is 0.3 s and the device 0.2 s steady but the one-time compile is
    minutes — not worth it; at 250k x 250k scipy is ~19 s bidirectional vs
    ~2 s device steady.  5e9 ~ 70k x 70k is the cross-over given one
    compile amortized over a protocol's ~77 scans."""
    if n_query * n_ref < 5e9:
        return False
    try:
        import jax

        return jax.default_backend() not in ("cpu",)
    except Exception:  # jax missing/broken: host path always works
        return False


def nearest_neighbors(
    query: np.ndarray, ref: np.ndarray, backend: str = "auto"
):
    """Nearest neighbor of each ``query`` point in ``ref``.

    backend: 'auto' (device when a TPU/GPU is attached and the problem is
    large), 'device', or 'scipy'.  Returns (dist [N], idx [N]) matching
    ``scipy.spatial.cKDTree.query``.
    """
    query = np.asarray(query)
    ref = np.asarray(ref)
    if backend == "device" or (
        backend == "auto" and _use_device(len(query), len(ref))
    ):
        return _device_directed(query, ref)
    from scipy.spatial import cKDTree as KDTree

    dist, idx = KDTree(ref).query(query)
    return dist, idx
