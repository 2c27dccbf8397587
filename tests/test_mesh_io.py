"""PLY IO: vectorized uniform-list fast path vs per-row fallback.

The binary face-list reader has a structured-array fast path for uniform
list lengths (triangles/quads) — a res-256 reconstruction has ~1.7M faces
and the per-face Python loop cost ~31 s; the fast path reads it in <1 s.
"""

import numpy as np

from nphm_tpu.utils.mesh_io import read_ply, write_ply

QUAD_V = np.array(
    [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32
)
_HDR = (
    b"ply\nformat binary_little_endian 1.0\n"
    b"element vertex 4\n"
    b"property float x\nproperty float y\nproperty float z\n"
    b"element face %d\n"
    b"property list uchar int vertex_indices\nend_header\n"
)


def test_roundtrip_triangles(tmp_path):
    rng = np.random.default_rng(0)
    v = rng.normal(size=(500, 3)).astype(np.float32)
    f = rng.integers(0, 500, size=(900, 3)).astype(np.int64)
    p = tmp_path / "m.ply"
    write_ply(str(p), v, f)
    m = read_ply(str(p))
    assert np.allclose(m.vertices, v)
    assert np.array_equal(m.faces, f)


def test_uniform_quads_fan_triangulated(tmp_path):
    p = tmp_path / "q.ply"
    body = QUAD_V.tobytes() + bytes([4]) + np.array([0, 1, 2, 3], "<i4").tobytes()
    p.write_bytes(_HDR % 1 + body)
    m = read_ply(str(p))
    assert np.array_equal(m.faces, [[0, 1, 2], [0, 2, 3]])


def test_mixed_length_lists_fall_back(tmp_path):
    p = tmp_path / "mix.ply"
    body = (
        QUAD_V.tobytes()
        + bytes([3]) + np.array([0, 1, 2], "<i4").tobytes()
        + bytes([4]) + np.array([0, 1, 2, 3], "<i4").tobytes()
    )
    p.write_bytes(_HDR % 2 + body)
    m = read_ply(str(p))
    assert np.array_equal(m.faces, [[0, 1, 2], [0, 1, 2], [0, 2, 3]])
