"""Cross-platform Mosaic LOWERING checks for every Pallas kernel.

Interpret-mode parity tests (the rest of tests/test_pallas*.py) validate
kernel *math* but skip Mosaic's structural constraints — block shapes,
memory spaces, layout rules — which are only enforced when lowering for
the TPU target.  That gap shipped a default-on kernel in round 4 whose
per-obs bias block ``(H, 1)`` over a ``[H, B]`` array is un-lowerable for
``B > 1``: every interpret test passed while the driver bench fell back to
XLA four times (BENCH_r04, VERDICT r4 weak #1).

``jax.jit(f).trace(...).lower(lowering_platforms=("tpu",))`` runs the real
Mosaic lowering (jax/_src/pallas/mosaic/lowering.py) WITHOUT TPU hardware —
the same mechanism ``jax.export`` uses — so the CPU suite can pin it.  It
does not reach the Mosaic *backend* (register allocation, VMEM stack
accounting); hardware-only failures still need the bench/fallback path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nphm_tpu.models import (
    DeformationConfig,
    NPHMConfig,
    make_deformation_decoder,
    make_nphm_decoder,
)


def _lowers_for_tpu(fn, *args):
    jax.jit(fn).trace(*args).lower(lowering_platforms=("tpu",))


# ---------------------------------------------------------------- search


@pytest.mark.parametrize(
    "nb,npts",
    [
        (1, 1000),  # single obs: bias panel == one tile
        (5, 1000),  # the exact r04 driver-bench fit dims (B>1 killed it)
        (2, 2500),  # >1 tile per obs (tpo=3 at tile=1024)
    ],
)
def test_search_kernel_lowers_at_production_dims(nb, npts):
    from nphm_tpu.ops.pallas_search import search_pallas

    ncfg = NPHMConfig()  # production shape decoder -> real cond width
    dcfg = DeformationConfig()  # production deformation trunk
    dec = make_deformation_decoder(dcfg)
    params = dec.init(jax.random.PRNGKey(0))
    obs = jnp.zeros((nb, npts, 3), jnp.float32)
    cond = jnp.zeros((nb, ncfg.lat_dim + dcfg.lat_dim_expr), jnp.float32)
    anchors = jnp.zeros((nb, ncfg.n_loc, 3), jnp.float32)
    jinv = jnp.broadcast_to(jnp.eye(3), (nb, npts, 3, 3))

    def f(params, cond, obs, jinv):
        xc, res = search_pallas(
            dec, params, obs, cond, anchors, max_steps=5,
            xc_init=obs, j_inv_init=jinv, interpret=False,
        )
        return xc, res["diff"]

    _lowers_for_tpu(f, params, cond, obs, jinv)


def test_search_kernel_lowers_npm_family():
    from nphm_tpu.config import build_expression_decoder
    from nphm_tpu.ops.pallas_search import search_fusable, search_pallas

    dec = build_expression_decoder(
        {
            "id_decoder": {"decoder_lat_dim": 512},
            "ex_decoder": {
                "decoder_lat_dim": 200,
                "decoder_hidden_dim": 1024,
                "decoder_nlayers": 8,
            },
        },
        "npm",
    )
    assert search_fusable(dec)
    params = dec.init(jax.random.PRNGKey(0))
    nb, npts = 5, 1000
    obs = jnp.zeros((nb, npts, 3), jnp.float32)
    cond = jnp.zeros((nb, 712), jnp.float32)
    jinv = jnp.broadcast_to(jnp.eye(3), (nb, npts, 3, 3))

    def f(params, cond, obs, jinv):
        xc, res = search_pallas(
            dec, params, obs, cond, None, max_steps=5,
            xc_init=obs, j_inv_init=jinv, interpret=False,
        )
        return xc, res["diff"]

    _lowers_for_tpu(f, params, cond, obs, jinv)


# ------------------------------------------------------- training kernels


def _nphm_production():
    cfg = NPHMConfig()
    rng = np.random.default_rng(0)
    anchors = (rng.normal(size=(cfg.n_loc, 3)) * 0.3).astype(np.float32)
    dec = make_nphm_decoder(cfg, anchors)
    return cfg, dec, dec.init(jax.random.PRNGKey(0))


def test_fit_kernel_lowers_at_production_dims():
    from nphm_tpu.ops.pallas_train import apply_nphm_fit_pallas

    cfg, dec, params = _nphm_production()
    pts = jnp.zeros((5, 1000, 3), jnp.float32)
    lat = jnp.zeros((5, cfg.lat_dim), jnp.float32)

    def f(params, pts, lat):
        sdf, _ = apply_nphm_fit_pallas(params, cfg, pts, lat, interpret=False)
        return sdf

    _lowers_for_tpu(f, params, pts, lat)


def test_train_kernel_lowers_at_production_dims():
    from nphm_tpu.ops.pallas_train import apply_nphm_train_pallas

    cfg, dec, params = _nphm_production()
    B, N = 32, 1693
    pts = jnp.zeros((B, N, 3), jnp.float32)
    lat = jnp.zeros((B, cfg.lat_dim), jnp.float32)

    def f(params, pts, lat):
        sdf, grads, _ = apply_nphm_train_pallas(
            params, cfg, pts, lat, interpret=False
        )
        return sdf, grads

    _lowers_for_tpu(f, params, pts, lat)

    # the double-backprop custom VJP is its own kernel: lower the grad too
    def g(params, pts, lat):
        def loss(p, x, z):
            sdf, grads, _ = apply_nphm_train_pallas(
                p, cfg, x, z, interpret=False
            )
            return jnp.sum(jnp.abs(sdf)) + jnp.sum(grads * grads)

        return jax.grad(loss, argnums=(1, 2))(params, pts, lat)

    _lowers_for_tpu(g, params, pts, lat)


def test_extraction_kernel_lowers_at_production_dims():
    from nphm_tpu.ops.pallas_ensemble import nphm_grid_sdf_pallas

    cfg, dec, params = _nphm_production()
    lat = jnp.zeros((cfg.lat_dim,), jnp.float32)
    mini, maxi = (-0.55, -0.5, -0.95), (0.55, 0.75, 0.4)

    def f(params, lat):
        return nphm_grid_sdf_pallas(
            params, cfg, lat, mini, maxi, 64, interpret=False
        )

    _lowers_for_tpu(f, params, lat)
