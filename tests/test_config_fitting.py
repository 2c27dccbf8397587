"""Config round-trip for the live fitting YAML lambdas/schedule surface
(VERDICT r1 item 7)."""

import numpy as np
import pytest

import jax

from nphm_tpu.config import fitting_overrides_from_cfg
from nphm_tpu.fitting.inference import (
    default_joint_lambdas,
    default_joint_schedule,
)


def test_absent_blocks_yield_defaults():
    lambdas, schedule = fitting_overrides_from_cfg({"exp_name_shape": "x"})
    assert lambdas is None and schedule is None


def test_lambdas_merge_over_defaults():
    cfg = {"lambdas": {"surface": 3.5, "reg_expr": 0.5}}
    lambdas, _ = fitting_overrides_from_cfg(cfg)
    base = default_joint_lambdas()
    assert lambdas["surface"] == 3.5 and lambdas["reg_expr"] == 0.5
    for k in base:
        if k not in ("surface", "reg_expr"):
            assert lambdas[k] == base[k]


def test_unknown_lambda_is_rejected():
    with pytest.raises(ValueError, match="unknown fitting lambdas"):
        fitting_overrides_from_cfg({"lambdas": {"nope": 1.0}})


def test_schedule_coerces_yaml_keys():
    cfg = {"schedule": {"lr": {"200": 2, 400: "4"}}}
    _, schedule = fitting_overrides_from_cfg(cfg)
    assert schedule == {"lr": {200: 2.0, 400: 4.0}}


def test_overrides_change_the_compiled_fit(rng):
    """End-to-end: a lambdas override must actually alter fit_joint's result
    (i.e. the CLI block is live, not decorative)."""
    from nphm_tpu.fitting import FittingConfig, fit_joint
    from nphm_tpu.models import (
        DeformationConfig,
        NPHMConfig,
        make_deformation_decoder,
        make_nphm_decoder,
    )

    cfg = NPHMConfig(
        lat_dim_glob=8, lat_dim_loc=4, n_loc=7, n_symm_pairs=3,
        hidden_dim=16, n_layers=4, pos_mlp_dim=16,
    )
    anchors = (rng.normal(size=(cfg.n_loc, 3)) * 0.3).astype(np.float32)
    dec = make_nphm_decoder(cfg, anchors)
    params = dec.init(jax.random.PRNGKey(0))
    dcfg = DeformationConfig(
        mode="glob_only", lat_dim_glob_shape=cfg.lat_dim_glob,
        lat_dim_expr=8, hidden_dim=48, n_layers=4,
    )
    expr = make_deformation_decoder(dcfg)
    p_expr = expr.init(jax.random.PRNGKey(1))
    obs = [rng.normal(size=(64, 3)).astype(np.float32) * 0.3 for _ in range(2)]
    fc = FittingConfig(
        n_steps=10, n_obs_per_batch=2, n_points_per_obs=32, log_every=100000
    )

    base_l, base_s = fitting_overrides_from_cfg(
        {"lambdas": {"surface": 2.0}, "schedule": {"lr": {5: 2}}}
    )
    strong_l, _ = fitting_overrides_from_cfg(
        {"lambdas": {"reg_global": 250.0}}
    )
    _, ls1, _, _ = fit_joint(
        dec, params, expr, p_expr, obs, cfg=fc, lambdas=base_l,
        schedule=base_s, verbose=False,
    )
    _, ls2, _, _ = fit_joint(
        dec, params, expr, p_expr, obs, cfg=fc, lambdas=strong_l,
        verbose=False,
    )
    assert not np.allclose(np.asarray(ls1), np.asarray(ls2))
    # the much stronger global regularizer must shrink the global code
    g = cfg.lat_dim_glob
    assert np.linalg.norm(np.asarray(ls2)[..., :g]) < np.linalg.norm(
        np.asarray(ls1)[..., :g]
    )
