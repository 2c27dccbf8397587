"""Fused Broyden-search kernel vs. the XLA search (interpret mode).

``ops/pallas_search.py`` runs the whole correspondence search — residual
init + all rank-1 iterations — as one Pallas kernel.  Its contract is the
warm path of ``fitting/broyden.py:search`` (explicit xc/J^-1 inits); these
tests pin exact parity of roots, residual norms, validity masks, refined
inverse Jacobians, executed iteration counts, and the end-to-end fit
trajectory, on the CPU interpreter (full f32, same kernel logic).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nphm_tpu.fitting import FittingConfig, fit_joint
from nphm_tpu.fitting.broyden import search
from nphm_tpu.fitting.inference import _use_fused_search
from nphm_tpu.models import (
    DeformationConfig,
    NPHMConfig,
    make_deformation_decoder,
    make_nphm_decoder,
)
from nphm_tpu.ops.pallas_search import search_fusable, search_pallas


def _setup(mode="compress", n_pts=700, nb=2, seed=0):
    cfg = DeformationConfig(
        mode=mode, lat_dim_glob_shape=16, lat_dim_loc_shape=8, n_loc=7,
        lat_dim_expr=8, lat_dim_id=8, hidden_dim=48, n_layers=4,
    )
    dec = make_deformation_decoder(cfg)
    params = dec.init(jax.random.PRNGKey(seed))
    rng = np.random.default_rng(seed)
    obs = jnp.asarray(rng.normal(size=(nb, n_pts, 3)).astype(np.float32)) * 0.3
    cond = jnp.asarray(
        rng.normal(size=(nb, cfg.lat_dim_shape_full + cfg.lat_dim_expr))
        .astype(np.float32) * 0.1
    )
    anchors = jnp.asarray(
        rng.normal(size=(nb, 7, 3)).astype(np.float32) * 0.3
    )
    return cfg, dec, params, obs, cond, anchors


def _identity_j(obs):
    return jnp.broadcast_to(jnp.eye(3, dtype=obs.dtype), obs.shape[:-1] + (3, 3))


def _both(dec, params, obs, cond, anchors, xc0, jinv0, steps, tile=512):
    ref_xc, ref = search(
        dec, params, obs, cond, anchors, max_steps=steps,
        xc_init=xc0, j_inv_init=jinv0,
    )
    ker_xc, ker = search_pallas(
        dec, params, obs, cond, anchors, max_steps=steps,
        xc_init=xc0, j_inv_init=jinv0, tile=tile, interpret=True,
    )
    return (ref_xc, ref), (ker_xc, ker)


def _assert_parity(ref_pair, ker_pair):
    (ref_xc, ref), (ker_xc, ker) = ref_pair, ker_pair
    np.testing.assert_allclose(
        np.asarray(ker_xc), np.asarray(ref_xc), atol=5e-6
    )
    np.testing.assert_allclose(
        np.asarray(ker["diff"]), np.asarray(ref["diff"]), atol=5e-6
    )
    # masks computed from thresholds may flip on ulp-level diffs right at
    # the threshold; require >=99.5% agreement and identical counts +-1
    agree = np.mean(
        np.asarray(ker["valid_ids"]).ravel()
        == np.asarray(ref["valid_ids"]).ravel()
    )
    assert agree >= 0.995, agree
    # J^-1 entries divide by tiny secant denominators, amplifying ulp-level
    # ordering diffs between the kernel and XLA — hint-grade tolerance
    np.testing.assert_allclose(
        np.asarray(ker["j_inv"]), np.asarray(ref["j_inv"]), atol=3e-4
    )
    assert int(ker["iters"]) == int(ref["iters"])


@pytest.mark.parametrize("mode", ["compress", "glob_only", "expr_only", "GNN"])
def test_identity_init_parity(mode):
    cfg, dec, params, obs, cond, anchors = _setup(mode)
    xc0 = obs
    jinv0 = _identity_j(obs)
    _assert_parity(*_both(dec, params, obs, cond, anchors, xc0, jinv0, 8))


def test_npm_family_parity():
    """The NPM offsets net (bare DeepSDF, kind='deformation_npm') fuses too."""
    from nphm_tpu.config import build_expression_decoder

    dec = build_expression_decoder(
        {
            "id_decoder": {"decoder_lat_dim": 12},
            "ex_decoder": {
                "decoder_lat_dim": 8,
                "decoder_hidden_dim": 48,
                "decoder_nlayers": 4,
            },
        },
        "npm",
    )
    assert search_fusable(dec)
    params = dec.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    obs = jnp.asarray(rng.normal(size=(2, 500, 3)).astype(np.float32)) * 0.3
    cond = jnp.asarray(rng.normal(size=(2, 20)).astype(np.float32)) * 0.1
    _assert_parity(
        *_both(dec, params, obs, cond, None, obs, _identity_j(obs), 6)
    )


def test_warm_store_init_parity():
    """Resume from a previous search's refined state (the warm fit loop)."""
    cfg, dec, params, obs, cond, anchors = _setup()
    xc1, res1 = search(
        dec, params, obs, cond, anchors, max_steps=4,
        xc_init=obs, j_inv_init=_identity_j(obs),
    )
    _assert_parity(
        *_both(dec, params, obs, cond, anchors, xc1, res1["j_inv"], 3)
    )


def test_nondivisible_point_count():
    """Tile padding: pad lanes must not alter results or hold the loop open."""
    cfg, dec, params, obs, cond, anchors = _setup(n_pts=700)
    jinv0 = _identity_j(obs)
    small = _both(dec, params, obs, cond, anchors, obs, jinv0, 6, tile=256)
    _assert_parity(*small)


def test_runtime_budget_scalar():
    """One compiled kernel serves every iteration budget (SMEM scalar)."""
    cfg, dec, params, obs, cond, anchors = _setup(n_pts=256)
    jinv0 = _identity_j(obs)

    @jax.jit
    def run(budget):
        _, res = search_pallas(
            dec, params, obs, cond, anchors, max_steps=budget,
            xc_init=obs, j_inv_init=jinv0, interpret=True,
        )
        return res["diff"], res["iters"]

    for budget in (1, 3, 7):
        _, ref = search(
            dec, params, obs, cond, anchors, max_steps=budget,
            xc_init=obs, j_inv_init=jinv0,
        )
        diff, iters = run(jnp.asarray(budget, jnp.int32))
        np.testing.assert_allclose(
            np.asarray(diff), np.asarray(ref["diff"]), atol=5e-6
        )
        assert int(iters) == int(ref["iters"])


def test_vmap_parity():
    """The batched fit vmaps the search over subjects (pipelines the grid)."""
    cfg, dec, params, obs, cond, anchors = _setup(nb=2, n_pts=300)
    S = 3
    key = jax.random.PRNGKey(7)
    obs_s = obs[None] + 0.05 * jax.random.normal(key, (S,) + obs.shape)
    cond_s = jnp.broadcast_to(cond[None], (S,) + cond.shape)
    anchors_s = jnp.broadcast_to(anchors[None], (S,) + anchors.shape)
    jinv0 = _identity_j(obs)

    def one(o, c, a, kernel):
        fn = search_pallas if kernel else search
        kw = dict(interpret=True) if kernel else {}
        xc, res = fn(
            dec, params, o, c, a, max_steps=5,
            xc_init=o, j_inv_init=jinv0, **kw,
        )
        return xc, res["diff"]

    xc_r, d_r = jax.vmap(lambda o, c, a: one(o, c, a, False))(
        obs_s, cond_s, anchors_s
    )
    xc_k, d_k = jax.vmap(lambda o, c, a: one(o, c, a, True))(
        obs_s, cond_s, anchors_s
    )
    np.testing.assert_allclose(np.asarray(xc_k), np.asarray(xc_r), atol=5e-6)
    np.testing.assert_allclose(np.asarray(d_k), np.asarray(d_r), atol=5e-6)


def test_search_fusable_gate():
    cfg, dec, *_ = _setup()
    assert search_fusable(dec)
    interp = make_deformation_decoder(
        DeformationConfig(
            mode="interpolate", lat_dim_glob_shape=16, lat_dim_loc_shape=8,
            n_loc=7, lat_dim_expr=8, hidden_dim=48, n_layers=4,
        )
    )
    assert not search_fusable(interp)
    shape_dec = make_nphm_decoder(
        NPHMConfig(
            lat_dim_glob=16, lat_dim_loc=8, n_loc=7, n_symm_pairs=3,
            hidden_dim=40, n_layers=4, pos_mlp_dim=32,
        ),
        np.zeros((7, 3), np.float32),
    )
    assert not search_fusable(shape_dec)


def test_use_fused_search_config_gate():
    _, dec, *_ = _setup()
    on = FittingConfig(fused_search="on")
    assert _use_fused_search(dec, on)
    # cold autograd-J init path is XLA-only
    assert not _use_fused_search(
        dec, FittingConfig(fused_search="on", warm_jacobian_store=False,
                           warm_identity_jacobian=False)
    )
    assert not _use_fused_search(
        dec, FittingConfig(fused_search="on", warm_start_corresp=False)
    )
    assert not _use_fused_search(
        dec, FittingConfig(fused_search="on", broyden_frac_exit=1e-3)
    )
    assert not _use_fused_search(dec, FittingConfig(fused_search="off"))


def test_use_fused_search_vmem_gate(monkeypatch):
    """"auto" skips trunks whose VMEM-resident weights cannot fit: the NPM
    family's production 8x1024 offsets net failed the Mosaic compile on
    hardware (r05 npm_fit_ab.py — every NPM fit paid a doomed compile then
    fell back), so its estimate must exceed the gate and the NPHM
    deformation trunk's must not.  "on" still forces a try."""
    import jax

    from nphm_tpu.config import build_expression_decoder
    from nphm_tpu.ops.pallas_search import search_vmem_estimate

    npm = build_expression_decoder(
        {"id_decoder": {"decoder_lat_dim": 512},
         "ex_decoder": {"decoder_lat_dim": 200, "decoder_hidden_dim": 1024,
                        "decoder_nlayers": 8}},
        "npm",
    )
    nphm_def = make_deformation_decoder(DeformationConfig())
    assert search_vmem_estimate(npm) > (32 << 20)
    assert search_vmem_estimate(nphm_def) <= (32 << 20)

    from nphm_tpu.fitting import inference as inf

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    auto = FittingConfig(fused_search="auto")
    assert not inf._use_fused_search(npm, auto)
    assert inf._use_fused_search(nphm_def, auto)
    assert inf._use_fused_search(npm, FittingConfig(fused_search="on"))


def test_fit_joint_fused_matches_xla():
    """End-to-end: the fused-search fit reproduces the XLA fit trajectory."""
    rng = np.random.default_rng(3)
    shape_cfg = NPHMConfig(
        lat_dim_glob=16, lat_dim_loc=8, n_loc=7, n_symm_pairs=3,
        hidden_dim=40, n_layers=4, pos_mlp_dim=32,
    )
    mean_anchors = (rng.normal(size=(7, 3)) * 0.3).astype(np.float32)
    shape_dec = make_nphm_decoder(shape_cfg, mean_anchors)
    shape_params = shape_dec.init(jax.random.PRNGKey(0))
    dcfg = DeformationConfig(
        mode="compress", lat_dim_glob_shape=16, lat_dim_loc_shape=8, n_loc=7,
        lat_dim_expr=8, lat_dim_id=8, hidden_dim=48, n_layers=4,
    )
    expr_dec = make_deformation_decoder(dcfg)
    expr_params = expr_dec.init(jax.random.PRNGKey(1))
    obs = [
        (rng.normal(size=(400, 3)) * 0.3).astype(np.float32) for _ in range(2)
    ]

    def run(fused):
        cfg = FittingConfig(
            n_steps=6, n_obs_per_batch=2, n_points_per_obs=100,
            fused_search=fused, fused_shape_fields="off",
        )
        lat_e, lat_s, _, hist = fit_joint(
            shape_dec, shape_params, expr_dec, expr_params, obs,
            cfg=cfg, verbose=False,
        )
        return lat_e, lat_s, hist

    le_x, ls_x, h_x = run("off")
    le_k, ls_k, h_k = run("on")
    # roots agree to ~1e-6 per step, but ulp-level differences compound
    # through Adam across steps — trajectory-level, not exact, tolerances
    np.testing.assert_allclose(h_k["loss"], h_x["loss"], rtol=5e-3, atol=1e-6)
    np.testing.assert_allclose(le_k, le_x, atol=2e-3)
    np.testing.assert_allclose(ls_k, ls_x, atol=2e-3)
    assert np.max(np.abs(h_k["n_valid"] - h_x["n_valid"])) <= 2
