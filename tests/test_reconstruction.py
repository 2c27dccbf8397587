"""Mesh IO, marching tetrahedra, and (sharded) grid extraction tests."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nphm_tpu.ops.grid import create_grid_points_from_bounds
from nphm_tpu.ops.marching import marching_tets, mesh_from_logits
from nphm_tpu.parallel import get_device_mesh
from nphm_tpu.reconstruction import (
    deform_mesh,
    extract_mesh,
    get_logits,
    make_point_evaluator,
)
from nphm_tpu.utils.mesh_io import Mesh, read_ply, write_ply


# --- PLY IO -----------------------------------------------------------------


def _toy_mesh():
    v = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32
    )
    f = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]], np.int64)
    return Mesh(v, f)


@pytest.mark.parametrize("binary", [True, False])
def test_ply_roundtrip(tmp_path, binary):
    m = _toy_mesh()
    colors = np.array([[255, 0, 0, 255]] * 4, np.uint8)
    path = str(tmp_path / "m.ply")
    write_ply(path, m.vertices, m.faces, normals=m.vertex_normals, colors=colors, binary=binary)
    m2 = read_ply(path)
    np.testing.assert_allclose(m2.vertices, m.vertices, atol=1e-6)
    np.testing.assert_array_equal(m2.faces, m.faces)
    np.testing.assert_array_equal(m2.vertex_colors, colors)


@pytest.mark.skipif(
    not os.path.exists("/root/reference/assets/template.ply"),
    reason="reference assets unavailable",
)
def test_ply_reads_reference_assets():
    m = read_ply("/root/reference/assets/template.ply")
    assert m.vertices.shape == (5023, 3)
    assert m.faces.shape[1] == 3 and len(m.faces) >= 9976
    assert m.vertex_colors is not None
    m2 = read_ply("/root/reference/assets/better_face_region.ply")
    assert m2.vertices.shape == (1664, 3)


def test_mesh_helpers():
    m = _toy_mesh()
    assert np.all(m.face_areas > 0)
    n = m.vertex_normals
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, rtol=1e-5)
    sub = m.submesh_by_vertex_mask(np.array([True, True, True, False]))
    assert len(sub.vertices) == 3 and len(sub.faces) == 1


# --- marching tetrahedra ----------------------------------------------------


def test_marching_tets_sphere():
    res = 64
    pts = create_grid_points_from_bounds([-1, -1, -1], [1, 1, 1], res)
    sdf = np.linalg.norm(pts, axis=-1) - 0.6
    mesh = mesh_from_logits(sdf, [-1, -1, -1], [1, 1, 1], res)
    r = np.linalg.norm(mesh.vertices, axis=-1)
    assert abs(r.mean() - 0.6) < 2e-3
    assert r.std() < 2e-3
    # watertight: every undirected edge shared by exactly two faces
    f = mesh.faces
    edges = np.sort(np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]]), axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert set(counts.tolist()) == {2}
    # outward orientation
    fn = mesh.face_normals
    cent = mesh.vertices[f].mean(axis=1)
    assert np.mean(np.sum(fn * cent, -1) > 0) == 1.0


def test_marching_tets_translated_ellipsoid():
    res = 48
    mini, maxi = [-1, -1.5, -0.5], [1.2, 0.8, 1.5]
    pts = create_grid_points_from_bounds(mini, maxi, res)
    c = np.array([0.1, -0.3, 0.4])
    radii = np.array([0.5, 0.7, 0.3])
    sdf = np.linalg.norm((pts - c) / radii, axis=-1) - 1.0  # approx sdf
    mesh = mesh_from_logits(sdf, mini, maxi, res)
    q = np.linalg.norm((mesh.vertices - c) / radii, axis=-1)
    assert np.abs(q - 1.0).max() < 0.05


def test_marching_tets_empty():
    grid = -np.ones((8, 8, 8), np.float32)
    v, f = marching_tets(grid, 0.0)
    assert len(v) == 0 and len(f) == 0


def test_marching_tets_window_equals_dense():
    """Slab windows with global coords + edge keys reproduce the dense mesh
    exactly under arbitrary (uneven) slab splits, including the clamped
    last slab and an empty window."""
    from nphm_tpu.ops.marching import marching_tets_window

    res = 40
    ax = np.linspace(-1, 1, res, dtype=np.float32)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    f = (
        np.sqrt(X**2 + Y**2 + Z**2)
        - 0.55
        + 0.15 * np.sin(4 * X) * np.sin(5 * Y) * np.sin(3 * Z)
    ).astype(np.float32)
    vd, fd = marching_tets(-f, 0.0)

    # uneven splits: 17 + 13 + 10 voxel slabs, +1 halo plane except the last
    parts, bounds = [], [(0, 17), (17, 30), (30, 40)]
    for x0, x1 in bounds:
        halo = 1 if x1 < res else 0
        parts.append(
            marching_tets_window(
                -f[x0 : x1 + halo], (x0, 0, 0), (res, res, res), 0.0
            )
        )
    verts = np.concatenate([p[0] for p in parts])
    keys = np.concatenate([p[1] for p in parts])
    off, faces = 0, []
    for p in parts:
        faces.append(p[2].astype(np.int64) + off)
        off += len(p[0])
    faces = np.concatenate(faces)
    _, first, inv = np.unique(keys, return_index=True, return_inverse=True)
    vw, fw = verts[first], inv[faces]

    assert len(vw) == len(vd)
    assert np.array_equal(
        vd[np.lexsort(vd.T)], vw[np.lexsort(vw.T)]
    )
    # triangle multisets agree (orientation-insensitive canon)
    def tris(v, fc):
        t = np.sort(v[fc].reshape(len(fc), 9), axis=1)
        return np.unique(t, axis=0)

    assert np.array_equal(tris(vd, fd), tris(vw, fw))

    # window past the global boundary marches nothing
    v0, k0, f0 = marching_tets_window(
        -f[39:40], (39, 0, 0), (res, res, res), 0.0
    )
    assert len(v0) == 0 and len(k0) == 0 and len(f0) == 0


# --- chunked / sharded evaluation -------------------------------------------


@dataclasses.dataclass(frozen=True)
class SphereDecoder:
    radius: float = 0.5

    def apply(self, params, xyz, lat, **_):
        sdf = jnp.linalg.norm(xyz, axis=-1, keepdims=True) - self.radius
        return sdf + params["bias"] + 0.0 * lat.sum(), None


def test_point_evaluator_padding():
    def point_fn(ctx, pts):
        return jnp.sum(pts**2, axis=-1, keepdims=True) + ctx["c"]

    ev = make_point_evaluator(point_fn, chunk_size=128)
    pts = np.random.default_rng(0).normal(size=(1000, 3)).astype(np.float32)
    out = ev({"c": 1.0}, pts)
    assert out.shape == (1000, 1)
    np.testing.assert_allclose(out[:, 0], (pts**2).sum(-1) + 1.0, rtol=1e-5)


@pytest.mark.parametrize("use_mesh", [False, True])
def test_extract_mesh_sphere(use_mesh):
    dec = SphereDecoder(0.5)
    params = {"bias": jnp.zeros(())}
    mesh = get_device_mesh() if use_mesh else None
    assert mesh is None or mesh.devices.size == 8
    tri = extract_mesh(
        dec, params, np.zeros((1, 4), np.float32),
        mini=(-1, -1, -1), maxi=(1, 1, 1), resolution=48,
        chunk_size=2048, mesh=mesh,
    )
    r = np.linalg.norm(tri.vertices, axis=-1)
    assert abs(r.mean() - 0.5) < 3e-3


def test_get_logits_matches_direct():
    dec = SphereDecoder(0.4)
    params = {"bias": jnp.zeros(())}
    pts = create_grid_points_from_bounds([-1, -1, -1], [1, 1, 1], 16)
    logits = get_logits(dec, params, np.zeros((1, 2), np.float32), pts, chunk_size=512)
    np.testing.assert_allclose(
        logits, np.linalg.norm(pts, axis=-1) - 0.4, rtol=1e-4, atol=1e-5
    )


def test_deform_mesh_translation():
    @dataclasses.dataclass(frozen=True)
    class Translator:
        def apply(self, params, xyz, lat, anchors=None, **_):
            return jnp.broadcast_to(params["t"], xyz.shape), None

    m = _toy_mesh()
    out = deform_mesh(
        m, Translator(), {"t": jnp.asarray([0.1, 0.2, -0.3])},
        np.zeros((1, 8), np.float32), chunk_size=64,
    )
    np.testing.assert_allclose(
        out.vertices, m.vertices + np.array([0.1, 0.2, -0.3]), rtol=1e-6
    )
    np.testing.assert_array_equal(out.faces, m.faces)


def test_deform_mesh_batch_matches_per_expression():
    """deform_mesh_batch == deform_mesh run once per expression (same warp
    math, one compiled call), including the lat_shape concat convention and
    the optional f16 delta transfer."""
    from nphm_tpu.reconstruction.extract import (
        deform_mesh_batch,
        make_deform_batch_evaluator,
    )

    @dataclasses.dataclass(frozen=True)
    class LatWarp:
        def apply(self, params, xyz, lat, anchors=None, **_):
            # delta depends on both position and the (shape|expr) latent
            s = jnp.sum(lat, axis=-1, keepdims=True)[..., None]
            return 0.05 * jnp.sin(xyz * 3.0) * s + params["t"], None

    m = _toy_mesh()
    params = {"t": jnp.asarray([0.01, -0.02, 0.03])}
    lat_shape = np.full((1, 4), 0.2, np.float32)
    lat_exprs = [
        np.full((1, 6), 0.1 * (i + 1), np.float32) for i in range(3)
    ]
    ref = [
        deform_mesh(
            m, LatWarp(), params, le, lat_shape=lat_shape, chunk_size=64
        )
        for le in lat_exprs
    ]
    out = deform_mesh_batch(
        m, LatWarp(), params, lat_exprs, lat_shape=lat_shape, chunk_size=64
    )
    assert len(out) == 3
    for a, b in zip(out, ref):
        np.testing.assert_allclose(a.vertices, b.vertices, atol=1e-6)
        np.testing.assert_array_equal(a.faces, b.faces)

    ev16 = make_deform_batch_evaluator(
        LatWarp(), chunk_size=64, transfer_dtype=np.float16
    )
    out16 = deform_mesh_batch(
        m, LatWarp(), params, lat_exprs, lat_shape=lat_shape, evaluator=ev16
    )
    for a, b in zip(out16, ref):
        np.testing.assert_allclose(a.vertices, b.vertices, atol=2e-4)


def test_streamed_extraction_matches_full():
    """extract_mesh_streamed (x-slab pipeline: device eval || transfer ||
    marching tets, VERDICT r1 item 4) produces the same geometry as the
    one-shot path: equal unique-vertex sets, face count, and surface area."""
    import jax
    import numpy as np

    from nphm_tpu.models import NPHMConfig, make_nphm_decoder
    from nphm_tpu.reconstruction.extract import (
        extract_mesh,
        extract_mesh_streamed,
    )

    cfg = NPHMConfig(
        lat_dim_glob=16, lat_dim_loc=8, n_loc=7, n_symm_pairs=3,
        hidden_dim=40, n_layers=4, pos_mlp_dim=32,
    )
    rng = np.random.default_rng(0)
    dec = make_nphm_decoder(
        cfg, (rng.normal(size=(cfg.n_loc, 3)) * 0.3).astype(np.float32)
    )
    params = dec.init(jax.random.PRNGKey(0))
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.lat_dim)) * 0.1
    mini, maxi = (-0.55, -0.5, -0.95), (0.55, 0.75, 0.4)

    full = extract_mesh(dec, params, lat, mini, maxi, 32, use_pallas=True)
    for n_slabs in (None, 2):
        streamed = extract_mesh_streamed(
            dec, params, lat, mini, maxi, 32, n_slabs=n_slabs
        )
        assert len(streamed.faces) == len(full.faces)
        # EXACT vertex-set equality: slabs march as windows of the global
        # lattice (global coords + global edge keys in csrc/marching.cpp),
        # so the streamed mesh is bit-identical to the one-shot mesh — a
        # local-coords march plus a post-hoc x-offset add rounded ~3% of
        # vertex positions differently at production dims (r05 hardware
        # probe) before this convention.
        assert len(streamed.vertices) == len(full.vertices)
        vf = np.unique(np.asarray(full.vertices, np.float32), axis=0)
        vs = np.unique(np.asarray(streamed.vertices, np.float32), axis=0)
        assert np.array_equal(vf, vs)

        def area(m):
            t = m.vertices[m.faces]
            return float(
                np.linalg.norm(
                    np.cross(t[:, 1] - t[:, 0], t[:, 2] - t[:, 0]), axis=-1
                ).sum()
                / 2
            )

        np.testing.assert_allclose(area(full), area(streamed), rtol=1e-6)


def test_streamed_extraction_transfer_dtype_and_fallback():
    import jax
    import numpy as np

    from nphm_tpu.models import NPHMConfig, make_nphm_decoder
    from nphm_tpu.reconstruction.extract import extract_mesh_streamed

    cfg = NPHMConfig(
        lat_dim_glob=16, lat_dim_loc=8, n_loc=7, n_symm_pairs=3,
        hidden_dim=40, n_layers=4, pos_mlp_dim=32,
    )
    rng = np.random.default_rng(0)
    dec = make_nphm_decoder(
        cfg, (rng.normal(size=(cfg.n_loc, 3)) * 0.3).astype(np.float32)
    )
    params = dec.init(jax.random.PRNGKey(0))
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.lat_dim)) * 0.1
    mini, maxi = (-0.55, -0.5, -0.95), (0.55, 0.75, 0.4)
    # f16 transfer: same topology, slightly rounded vertices
    m16 = extract_mesh_streamed(
        dec, params, lat, mini, maxi, 32, transfer_dtype=np.float16
    )
    assert len(m16.faces) > 0
    # resolutions with no brick decomposition fall back to the serial path
    m = extract_mesh_streamed(dec, params, lat, mini, maxi, 20)
    assert len(m.faces) > 0


def test_streamed_extraction_device_mesh_equals_single():
    """device_mesh= shards each slab's brick grid over the virtual 8-device
    mesh; the streamed mesh must match the single-device streamed mesh
    exactly (same kernel, same points, sharded axis only)."""
    import jax
    import numpy as np

    from nphm_tpu.models import NPHMConfig, make_nphm_decoder
    from nphm_tpu.parallel import get_device_mesh
    from nphm_tpu.reconstruction.extract import extract_mesh_streamed

    cfg = NPHMConfig(
        lat_dim_glob=16, lat_dim_loc=8, n_loc=7, n_symm_pairs=3,
        hidden_dim=40, n_layers=4, pos_mlp_dim=32,
    )
    rng = np.random.default_rng(0)
    dec = make_nphm_decoder(
        cfg, (rng.normal(size=(cfg.n_loc, 3)) * 0.3).astype(np.float32)
    )
    params = dec.init(jax.random.PRNGKey(0))
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.lat_dim)) * 0.1
    mini, maxi = (-0.55, -0.5, -0.95), (0.55, 0.75, 0.4)

    single = extract_mesh_streamed(dec, params, lat, mini, maxi, 32, n_slabs=2)
    sharded = extract_mesh_streamed(
        dec, params, lat, mini, maxi, 32, n_slabs=2,
        device_mesh=get_device_mesh(),
    )
    assert len(single.faces) == len(sharded.faces)
    vs_a = np.unique(np.asarray(single.vertices, np.float32), axis=0)
    vs_b = np.unique(np.asarray(sharded.vertices, np.float32), axis=0)
    assert vs_a.shape == vs_b.shape
    np.testing.assert_allclose(vs_a, vs_b, atol=1e-6)
