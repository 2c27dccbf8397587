"""Broyden root finding, IFT gradients, and analytic end-to-end fits."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nphm_tpu.fitting import FittingConfig, broyden, fit_identity, fit_joint, search
from nphm_tpu.fitting.broyden import ift_correction


# --- analytic stand-in decoders ----------------------------------------------


@dataclasses.dataclass(frozen=True)
class SphereDecoder:
    """sdf(x) = |x| - r where r = lat[0] + r0.  Mimics the Decoder protocol."""

    r0: float = 0.5
    lat_dim: int = 4
    lat_dim_glob = None
    lat_dim_loc = None
    n_symm_pairs = None

    def apply(self, params, xyz, lat, **_):
        r = self.r0 + lat[..., :1]
        sdf = jnp.linalg.norm(xyz, axis=-1, keepdims=True) - r[:, None, :]
        return sdf, None


@dataclasses.dataclass(frozen=True)
class SmoothWarp:
    """delta(x) = t + a*sin(x[::-1]) where t = last 3 latent dims."""

    amp: float = 0.1
    lat_dim: int = 3

    def apply(self, params, xyz, lat, anchors=None, **_):
        t = lat[..., -3:][:, None, :]
        delta = t + self.amp * jnp.sin(xyz[..., ::-1])
        return delta, None


def test_broyden_linear():
    # g(x) = A(x - c): exact Newton step converges immediately
    rng = np.random.default_rng(0)
    P = 64
    A = np.eye(3) + 0.2 * rng.normal(size=(P, 3, 3))
    c = rng.normal(size=(P, 3)).astype(np.float32)

    def g(x):
        return jnp.einsum("pij,pj->pi", jnp.asarray(A, jnp.float32), x - c)

    x0 = jnp.zeros((P, 3))
    j_inv = jnp.linalg.inv(jnp.asarray(A, jnp.float32))
    out = broyden(g, x0, j_inv, max_steps=15)
    assert bool(out["valid_ids"].all())
    np.testing.assert_allclose(np.asarray(out["result"]), c, atol=1e-5)
    # exact inverse Jacobian -> one Newton step: the early exit fires far
    # below the 15-step budget, and the executed count is reported
    assert 1 <= int(out["iters"]) <= 3


def test_broyden_nonlinear_with_approx_jacobian():
    def g(x):
        return x + 0.3 * jnp.sin(x[:, ::-1]) - 0.7

    P = 128
    x0 = jnp.zeros((P, 3)) + jnp.linspace(-1, 1, P)[:, None]
    j_inv = jnp.broadcast_to(jnp.eye(3), (P, 3, 3))  # identity init
    # dvg_thresh is tuned for near-init residuals in the fitting use case;
    # here inits are far from the root, so disable divergence culling.
    out = broyden(g, x0, j_inv, max_steps=25, dvg_thresh=100.0)
    assert float(out["valid_ids"].mean()) > 0.95
    res = np.asarray(g(out["result"]))
    assert np.linalg.norm(res[np.asarray(out["valid_ids"])], axis=-1).max() < 1e-5


def test_broyden_min_active_skips_straggler_tail():
    """min_active > 0 stops paying whole-batch iterations for a vanishing
    tail: easy points converge identically, the impossible straggler just
    fails the cvg validity test earlier (same outcome as after a full
    budget)."""

    def g(x):
        # rows 0..P-2: nearly-linear, converge in a couple of iterations;
        # row P-1: |sin| term keeps a residual floor of 1 -> never converges
        base = x + 0.1 * jnp.sin(x[:, ::-1]) - 0.5
        hard = jnp.zeros((x.shape[0], 1)).at[-1].set(1.0)
        return base + hard * (1.0 + jnp.abs(jnp.sin(x[:, :1] * 50)))

    P = 64
    x0 = jnp.zeros((P, 3))
    j_inv = jnp.broadcast_to(jnp.eye(3), (P, 3, 3))
    ref = broyden(g, x0, j_inv, max_steps=25, dvg_thresh=100.0)
    cut = broyden(g, x0, j_inv, max_steps=25, dvg_thresh=100.0, min_active=1)
    assert int(ref["iters"]) == 25  # the straggler holds the exit open
    assert int(cut["iters"]) < int(ref["iters"])
    np.testing.assert_array_equal(
        np.asarray(ref["valid_ids"]), np.asarray(cut["valid_ids"])
    )
    v = np.asarray(ref["valid_ids"])
    np.testing.assert_allclose(
        np.asarray(ref["result"])[v], np.asarray(cut["result"])[v], atol=1e-5
    )


def test_search_resumes_from_returned_jacobian():
    """A second search at the same points, warm-started with the refined
    ``j_inv`` from the first, must converge without the autograd Jacobian
    init (the warm_jacobian_store fit-loop contract)."""
    warp = SmoothWarp()
    lat = jnp.asarray([[0.2, -0.1, 0.15]])
    xc_true = jax.random.normal(jax.random.PRNGKey(2), (1, 40, 3)) * 0.5
    delta, _ = warp.apply(None, xc_true, lat)
    obs = xc_true + delta

    _, first = search(warp, None, obs, lat, None)
    assert first["j_inv"].shape == (1, 40, 3, 3)
    # perturb the latents slightly (as consecutive fit steps do) and resume
    lat2 = lat + 0.01
    delta2, _ = warp.apply(None, xc_true, lat2)
    obs2 = xc_true + delta2
    xc, second = search(
        warp, None, obs2, lat2, None,
        xc_init=first["result"], j_inv_init=first["j_inv"], max_steps=5,
    )
    assert float(second["valid_ids"].mean()) > 0.95
    err = np.linalg.norm(np.asarray(xc - xc_true), axis=-1)
    assert err[np.asarray(second["valid_ids"])].max() < 1e-4


def test_search_j_inv_resets_diverged_points_to_identity():
    """Diverged points must come back with an identity J^-1 (their rank-1
    history is following a garbage trajectory)."""

    @dataclasses.dataclass(frozen=True)
    class FlipWarp:
        # delta(x) = -2x + t  =>  g(x) = -(x + obs) + t: true J = -I, so an
        # identity-init Newton step moves AWAY from the root and the search
        # trips the divergence cull immediately
        lat_dim: int = 3

        def apply(self, params, xyz, lat, anchors=None, **_):
            return -2.0 * xyz + lat[:, None, :], None

    warp = FlipWarp()
    obs = jnp.ones((1, 8, 3)) * 2.0
    _, res = search(
        warp, None, obs, jnp.zeros((1, 3)), None, identity_j_init=True
    )
    assert not bool(np.asarray(res["valid_ids"]).any())
    assert (np.asarray(res["diff"]) >= 0.2).all()
    j = np.asarray(res["j_inv"])
    np.testing.assert_array_equal(
        j, np.broadcast_to(np.eye(3, dtype=j.dtype), j.shape)
    )


def test_search_j_inv_resets_dip_then_diverge_points():
    """A point whose residual first dips BELOW dvg_thresh and then blows up
    must also come back with identity J^-1: the reset is keyed on the final
    loop state (deactivated-but-not-converged), not on best_norm, which
    records the early dip and would mask the corrupted Jacobian history
    (ADVICE r3, medium)."""

    @dataclasses.dataclass(frozen=True)
    class ExpandWarp:
        # delta(x) = -21x  =>  g(x) = -20x - obs.  With x0 = obs and an
        # identity-J init the first Newton step lands at x1 = x0 - g(x0),
        # where g(x1) = 21*g(x0): the initial residual (|g0| = 0.15, below
        # dvg_thresh=0.2) becomes 3.15 and the point is culled as diverged
        # at iteration 1 with best_norm = 0.15 still below dvg_thresh.
        lat_dim: int = 3

        def apply(self, params, xyz, lat, anchors=None, **_):
            return -21.0 * xyz + lat[:, None, :], None

    warp = ExpandWarp()
    # obs with per-point norm 0.15/21 so |g(x0)| = |-21*obs| = 0.15
    v = np.array([1.0, 0.0, 0.0]) * (0.15 / 21.0)
    obs = jnp.asarray(np.broadcast_to(v, (1, 8, 3)).copy(), jnp.float32)
    _, res = search(
        warp, None, obs, jnp.zeros((1, 3)), None, identity_j_init=True
    )
    assert not bool(np.asarray(res["valid_ids"]).any())
    # best_norm sits below dvg_thresh — the old best_norm-keyed reset would
    # have kept the corrupted J^-1 here
    assert (np.asarray(res["diff"]) < 0.2).all()
    j = np.asarray(res["j_inv"])
    np.testing.assert_array_equal(
        j, np.broadcast_to(np.eye(3, dtype=j.dtype), j.shape)
    )


@pytest.mark.parametrize("multi", [False, True])
def test_search_finds_correspondences(multi):
    warp = SmoothWarp()
    lat = jnp.asarray([[0.2, -0.1, 0.15]])
    xc_true = jax.random.normal(jax.random.PRNGKey(0), (1, 50, 3)) * 0.5
    delta, _ = warp.apply(None, xc_true, lat)
    obs = xc_true + delta

    xc, result = search(
        warp, None, obs, lat, None, multi_corresp=multi,
        rng=jax.random.PRNGKey(1) if multi else None,
    )
    if multi:
        assert xc.shape == (1, 50, 5, 3)
        xc0 = xc[:, :, 0, :]
        valid = result["valid_ids"][:, :, 0]
    else:
        xc0 = xc
        valid = result["valid_ids"]
    assert float(valid.mean()) > 0.95
    err = np.linalg.norm(np.asarray(xc0 - xc_true), axis=-1)
    assert err[np.asarray(valid)].max() < 1e-4


def test_ift_gradient_matches_analytic():
    """Pure-translation warp: root xc = obs - t, so d loss / d t is exact."""

    @dataclasses.dataclass(frozen=True)
    class Translator:
        lat_dim: int = 3

        def apply(self, params, xyz, lat, anchors=None, **_):
            return jnp.broadcast_to(lat[:, None, :], xyz.shape), None

    dec = Translator()
    obs = jax.random.normal(jax.random.PRNGKey(0), (1, 20, 3))

    def loss(t):
        lat = t[None]
        xc_opt, _ = search(dec, None, obs, lat, None)
        xc = ift_correction(dec, None, xc_opt, lat, None)
        return jnp.sum(xc**2)

    t = jnp.asarray([0.3, -0.2, 0.1])
    g = jax.grad(loss)(t)
    # xc = obs - t  =>  d sum(xc^2)/dt = -2 sum(obs - t)
    expected = -2 * jnp.sum(obs[0] - t, axis=0)
    np.testing.assert_allclose(np.asarray(g), np.asarray(expected), rtol=1e-4)


def test_fit_identity_recovers_radius():
    # NOTE: the clamped |sdf| loss (reference fitting.py:125-133) only has
    # gradient where |sdf| < 0.1, so the initial guess must start inside the
    # clamp basin — true of real fits (zero latent ~= mean head).
    dec = SphereDecoder(r0=0.5, lat_dim=4)
    rng = np.random.default_rng(0)
    r_true = 0.58
    dirs = rng.normal(size=(3, 2000, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    obs = [d * r_true for d in dirs]

    cfg = FittingConfig(n_steps=300, log_every=1000)
    lat, _anchors, hist = fit_identity(
        dec, None, obs,
        lambdas={"surface": 2.0, "reg_global": 1e-4},
        schedule={"lr": {150: 2}},
        cfg=cfg, verbose=False,
    )
    assert abs(float(lat[0, 0]) + 0.5 - r_true) < 0.012
    assert hist["loss"][-1] < hist["loss"][5]


@pytest.mark.parametrize(
    "warm",
    [
        dict(warm_start_corresp=True),  # default: warm roots + warm J store
        dict(warm_start_corresp=True, warm_jacobian_store=False),
        dict(warm_start_corresp=True, broyden_frac_exit=0.002),
        dict(warm_start_corresp=True, ift_jacobian="broyden"),
        dict(warm_start_corresp=False),  # reference cold re-init
    ],
    ids=["warm+jstore", "warm", "warm+frac_exit", "warm+ift_broyden", "cold"],
)
def test_fit_joint_recovers_shape_and_translation(warm):
    """Observations are translated spheres; fit must find radius + per-obs t.

    Parametrized over warm-started vs reference cold-started Broyden
    correspondences (FittingConfig.warm_start_corresp), the carried
    inverse-Jacobian store, and the fraction-based early exit: all must
    converge to the same solution."""
    shape = SphereDecoder(r0=0.5, lat_dim=4)
    warp = SmoothWarp(amp=0.0, lat_dim=3)  # pure per-obs translation

    rng = np.random.default_rng(1)
    r_true = 0.55
    t_true = np.array([[0.03, 0.0, -0.02], [-0.01, 0.04, 0.02], [0.0, -0.03, 0.01]], np.float32)
    obs = []
    for k in range(3):
        d = rng.normal(size=(1500, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        obs.append(d * r_true + t_true[k])

    cfg = FittingConfig(n_steps=400, n_obs_per_batch=3, n_points_per_obs=500,
                        log_every=1000, **warm)
    lat_e, lat_s, _anchors, hist = fit_joint(
        shape, None, warp, None, obs,
        lambdas={"surface": 2.0, "reg_expr": 1e-4, "reg_global": 1e-4},
        schedule={"lr": {200: 2}},
        cfg=cfg, verbose=False,
    )
    # canonical xc = obs - t must lie on the fitted sphere
    assert abs(float(lat_s[0, 0]) + 0.5 - r_true) < 0.02
    # expression codes act as -t (warp adds t to canonical to produce posed):
    np.testing.assert_allclose(lat_e, t_true, atol=0.02)


def test_fit_joint_fused_shape_fields_matches_xla():
    """Routing the fit's shape-decoder eval through the fused Pallas
    training kernel (FittingConfig.fused_shape_fields) must reproduce the
    XLA path's optimization trajectory (interpret mode on CPU)."""
    from nphm_tpu.models import NPHMConfig, make_nphm_decoder

    cfg_m = NPHMConfig(
        lat_dim_glob=8, lat_dim_loc=4, n_loc=6, n_symm_pairs=2,
        hidden_dim=16, n_layers=4, pos_mlp_dim=16,
    )
    rng = np.random.default_rng(3)
    anchors = (rng.normal(size=(cfg_m.n_loc, 3)) * 0.25).astype(np.float32)
    dec = make_nphm_decoder(cfg_m, anchors)
    params = dec.init(jax.random.PRNGKey(0))
    warp = SmoothWarp(amp=0.02, lat_dim=3)
    obs = []
    for k in range(2):
        d = rng.normal(size=(300, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        obs.append((d * 0.4).astype(np.float32))

    base = dict(
        n_steps=5, n_obs_per_batch=2, n_points_per_obs=64, log_every=10**9
    )
    out = {}
    for tag, mode in (("xla", "off"), ("fused", True)):
        le, ls, _a, hist = fit_joint(
            dec, params, warp, None, obs,
            cfg=FittingConfig(fused_shape_fields=mode, **base),
            verbose=False,
        )
        out[tag] = (le, ls, hist)
    # single-eval kernel parity is ~1e-7 (tests/test_pallas_train.py); five
    # Adam steps amplify accumulation-order noise to ~1e-4 on the latents
    np.testing.assert_allclose(
        out["xla"][1], out["fused"][1], rtol=1e-3, atol=5e-4
    )
    np.testing.assert_allclose(
        out["xla"][0], out["fused"][0], rtol=1e-3, atol=5e-4
    )
    np.testing.assert_allclose(
        out["xla"][2]["loss"], out["fused"][2]["loss"], rtol=1e-3, atol=1e-5
    )


def test_fit_joint_fused_failure_falls_back_to_xla(monkeypatch, capsys):
    """A fused-kernel fit program that fails to build (tiny architectures
    hit a Mosaic compile limitation on real TPUs) must be retried on the
    XLA path instead of crashing the fit."""
    from nphm_tpu.fitting import inference as inf

    def fake_fields(decoder_shape, cfg, mesh=None):
        if cfg.fused_shape_fields in ("off", False):
            return None

        def boom(params_shape, pts, lat_b):
            raise RuntimeError("simulated Mosaic compile failure")

        return boom

    monkeypatch.setattr(inf, "_shape_fields_fn", fake_fields)

    shape = SphereDecoder(r0=0.5, lat_dim=4)
    warp = SmoothWarp(amp=0.0, lat_dim=3)
    rng = np.random.default_rng(7)
    d = rng.normal(size=(400, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    obs = [(d * 0.55).astype(np.float32)]

    # unique cfg so the lru_cached runner is built fresh under the patch
    cfg = FittingConfig(n_steps=7, n_obs_per_batch=1, n_points_per_obs=128,
                        log_every=10**9, seed=12345,
                        fused_shape_fields="on")
    lat_e, lat_s, _a, hist = fit_joint(
        shape, None, warp, None, obs,
        lambdas={"surface": 2.0, "reg_expr": 1e-4, "reg_global": 1e-4},
        cfg=cfg, verbose=False,
    )
    # staged fallback (VERDICT r4 item 2): only the failing flag is
    # downgraded, one at a time
    assert "retrying with {'fused_shape_fields': 'off'}" in (
        capsys.readouterr().out
    )
    assert np.isfinite(hist["loss"]).all()
    assert lat_s.shape == (1, 4)


def test_fit_joint_batch_matches_single_recipe():
    """Batched multi-subject fitting solves each subject like fit_joint does."""
    from nphm_tpu.fitting import fit_joint_batch

    shape = SphereDecoder(r0=0.5, lat_dim=4)
    warp = SmoothWarp(amp=0.0, lat_dim=3)

    rng = np.random.default_rng(2)
    r_true = [0.55, 0.45]
    subjects = []
    for r in r_true:
        obs = []
        for _ in range(3):
            d = rng.normal(size=(800, 3))
            d /= np.linalg.norm(d, axis=-1, keepdims=True)
            obs.append((d * r).astype(np.float32))
        subjects.append(obs)

    cfg = FittingConfig(
        n_steps=300, n_obs_per_batch=3, n_points_per_obs=400, log_every=1000
    )
    lat_es, lat_ss, _anchors, hist = fit_joint_batch(
        shape, None, warp, None, subjects,
        lambdas={"surface": 2.0, "reg_expr": 1e-4, "reg_global": 1e-4},
        schedule={"lr": {200: 2}},
        cfg=cfg, verbose=False,
    )
    assert hist["loss"].shape == (300, 2)
    for s, r in enumerate(r_true):
        assert abs(float(lat_ss[s][0, 0]) + 0.5 - r) < 0.02, (s, lat_ss[s][0, 0])
        assert lat_es[s].shape == (3, 3)


def test_fit_joint_batch_mesh_matches_single_device():
    """Sharding the subjects axis across a device mesh must reproduce the
    single-device batched fit (subjects are independent; the RNG folds the
    global subject index)."""
    from jax.sharding import Mesh

    from nphm_tpu.fitting import fit_joint_batch

    shape = SphereDecoder(r0=0.5, lat_dim=4)
    warp = SmoothWarp(amp=0.0, lat_dim=3)
    rng = np.random.default_rng(5)
    subjects = []
    for r in (0.55, 0.45, 0.6):  # 3 subjects -> padded to 4 on a 2-dev mesh
        obs = []
        for _ in range(2):
            d = rng.normal(size=(600, 3))
            d /= np.linalg.norm(d, axis=-1, keepdims=True)
            obs.append((d * r).astype(np.float32))
        subjects.append(obs)

    cfg = FittingConfig(
        n_steps=60, n_obs_per_batch=2, n_points_per_obs=256, log_every=1000
    )
    kw = dict(
        lambdas={"surface": 2.0, "reg_expr": 1e-4, "reg_global": 1e-4},
        cfg=cfg, verbose=False,
    )
    ref = fit_joint_batch(shape, None, warp, None, subjects, **kw)
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("data",))
    out = fit_joint_batch(shape, None, warp, None, subjects, mesh=mesh, **kw)
    for s in range(3):
        np.testing.assert_allclose(out[1][s], ref[1][s], atol=1e-5)
        np.testing.assert_allclose(out[0][s], ref[0][s], atol=1e-5)
    np.testing.assert_allclose(
        out[3]["loss"], ref[3]["loss"], rtol=1e-4, atol=1e-6
    )


def test_fit_joint_batch_subject_padding_matches_unpadded():
    """``pad_subjects_to`` (one executable for a trailing short protocol
    group) must not change any real subject's result: dummy rows ride the
    mesh-padding machinery and the RNG folds the global subject index."""
    from nphm_tpu.fitting import fit_joint_batch

    shape = SphereDecoder(r0=0.5, lat_dim=4)
    warp = SmoothWarp(amp=0.0, lat_dim=3)
    rng = np.random.default_rng(7)
    subjects = []
    for r in (0.55, 0.45, 0.6):
        obs = []
        for _ in range(2):
            d = rng.normal(size=(600, 3))
            d /= np.linalg.norm(d, axis=-1, keepdims=True)
            obs.append((d * r).astype(np.float32))
        subjects.append(obs)

    cfg = FittingConfig(
        n_steps=60, n_obs_per_batch=2, n_points_per_obs=256, log_every=1000
    )
    kw = dict(
        lambdas={"surface": 2.0, "reg_expr": 1e-4, "reg_global": 1e-4},
        cfg=cfg, verbose=False,
    )
    ref = fit_joint_batch(shape, None, warp, None, subjects, **kw)
    out = fit_joint_batch(
        shape, None, warp, None, subjects, pad_subjects_to=8, **kw
    )
    assert len(out[0]) == 3 and len(out[1]) == 3
    assert out[3]["loss"].shape == (60, 3)
    for s in range(3):
        np.testing.assert_allclose(out[1][s], ref[1][s], atol=1e-5)
        np.testing.assert_allclose(out[0][s], ref[0][s], atol=1e-5)
    np.testing.assert_allclose(
        out[3]["loss"], ref[3]["loss"], rtol=1e-4, atol=1e-6
    )


def test_fit_joint_segmented_matches_single_scan():
    """``steps_per_call`` splits the fit into several device invocations
    (bounding per-invocation execution time — the NPM family's 1000-step
    scan has crashed the TPU worker); the trajectory must be IDENTICAL to
    the single-scan program: the RNG folds the global step index and the
    full carry (latents, Adam state, warm stores) threads across segments.
    25 % 10 != 0 exercises the shorter remainder segment too."""
    shape = SphereDecoder(r0=0.5, lat_dim=4)
    warp = SmoothWarp(amp=0.05, lat_dim=3)
    rng = np.random.default_rng(11)
    d = rng.normal(size=(500, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    obs = [(d * 0.55).astype(np.float32) for _ in range(2)]

    base = dict(n_steps=25, n_obs_per_batch=2, n_points_per_obs=256,
                log_every=1000)
    kw = dict(
        lambdas={"surface": 2.0, "reg_expr": 1e-4, "reg_global": 1e-4},
        verbose=False,
    )
    ref = fit_joint(shape, None, warp, None, obs,
                    cfg=FittingConfig(steps_per_call=0, **base), **kw)
    out = fit_joint(shape, None, warp, None, obs,
                    cfg=FittingConfig(steps_per_call=10, **base), **kw)
    np.testing.assert_allclose(out[0], ref[0], atol=1e-6)
    np.testing.assert_allclose(out[1], ref[1], atol=1e-6)
    assert out[3]["loss"].shape == ref[3]["loss"].shape
    np.testing.assert_allclose(out[3]["loss"], ref[3]["loss"],
                               rtol=1e-5, atol=1e-7)


def test_fit_joint_batch_segmented_matches_single_scan():
    """Same segmentation-equivalence contract for the vmapped batch fit."""
    from nphm_tpu.fitting import fit_joint_batch

    shape = SphereDecoder(r0=0.5, lat_dim=4)
    warp = SmoothWarp(amp=0.05, lat_dim=3)
    rng = np.random.default_rng(13)
    subjects = []
    for r in (0.55, 0.45):
        d = rng.normal(size=(500, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        subjects.append([(d * r).astype(np.float32) for _ in range(2)])

    base = dict(n_steps=24, n_obs_per_batch=2, n_points_per_obs=256,
                log_every=1000)
    kw = dict(
        lambdas={"surface": 2.0, "reg_expr": 1e-4, "reg_global": 1e-4},
        verbose=False,
    )
    ref = fit_joint_batch(shape, None, warp, None, subjects,
                          cfg=FittingConfig(steps_per_call=0, **base), **kw)
    out = fit_joint_batch(shape, None, warp, None, subjects,
                          cfg=FittingConfig(steps_per_call=8, **base), **kw)
    for s in range(2):
        np.testing.assert_allclose(out[0][s], ref[0][s], atol=1e-6)
        np.testing.assert_allclose(out[1][s], ref[1][s], atol=1e-6)
    assert out[3]["loss"].shape == (24, 2)
    np.testing.assert_allclose(out[3]["loss"], ref[3]["loss"],
                               rtol=1e-5, atol=1e-7)


def test_fit_segments_auto_resolution():
    """-1 (auto) segments only non-NPHM decoders on a real TPU backend."""
    from nphm_tpu.fitting.inference import _fit_segments

    shape = SphereDecoder()  # kind attribute absent -> non-NPHM
    # explicit values are backend-independent
    assert _fit_segments(FittingConfig(steps_per_call=0), shape, 100) == [
        (0, 100)
    ]
    assert _fit_segments(FittingConfig(steps_per_call=40), shape, 100) == [
        (0, 40), (40, 40), (80, 20)
    ]
    # under the CPU test backend auto resolves to off for everyone
    assert _fit_segments(FittingConfig(), shape, 100) == [(0, 100)]


def test_fit_segments_auto_gates_on_mesh_platform(monkeypatch):
    """Auto segmentation decides on the platform the fit actually RUNS on
    (the mesh's devices), not the default backend: a CPU-mesh fit is never
    auto-segmented even when the process default is TPU.  The suite forces
    a CPU default backend, so the TPU default is monkeypatched in — without
    that both paths return 'cpu' and the test would pass vacuously."""
    from jax.sharding import Mesh

    from nphm_tpu.fitting import inference
    from nphm_tpu.fitting.inference import _fit_segments

    monkeypatch.setattr(inference.jax, "default_backend", lambda: "tpu")
    shape = SphereDecoder()  # non-NPHM: the family auto DOES segment on TPU
    # no mesh -> the (fake) TPU default backend governs: segmented
    assert len(_fit_segments(FittingConfig(), shape, 1000)) == 8
    # CPU mesh -> the mesh platform governs: unsegmented
    mesh = Mesh(np.array(jax.devices("cpu")[:1]), ("dp",))
    assert _fit_segments(FittingConfig(), shape, 1000, mesh) == [(0, 1000)]


def test_fit_segments_auto_segments_large_nphm_batches(monkeypatch):
    """Measured (BATCHSIZE_AB_r05 + RESILIENT_PROBE_r05): an unsegmented
    1000-step S=16 NPHM invocation crashes the TPU worker and poisons the
    backend, while segmentation is free.  Auto must therefore segment NPHM
    batch fits past 8 subjects/device and leave S<=8 on the measured-safe
    single-scan program."""
    from nphm_tpu.fitting import inference
    from nphm_tpu.fitting.inference import _fit_segments

    monkeypatch.setattr(inference.jax, "default_backend", lambda: "tpu")

    class NphmDecoder:
        kind = "nphm"

    cfg = FittingConfig()
    assert _fit_segments(cfg, NphmDecoder(), 1000, subjects_per_device=8) == [
        (0, 1000)
    ]
    assert len(
        _fit_segments(cfg, NphmDecoder(), 1000, subjects_per_device=16)
    ) == 8


def test_fit_joint_batch_resilient_bisects_on_crash():
    """VERDICT r1 item 6: a 23-subject protocol must survive injected TPU
    worker crashes.  A fake batch runner dies for groups > 4 (and once for
    one specific singleton); the wrapper bisects, retries, preserves
    per-subject output order, and reports the crash count."""
    from nphm_tpu.fitting.inference import fit_joint_batch_resilient

    calls = {"batch": [], "single": 0, "single_failed_once": False}

    def fake_batch(ds, ps, de, pe, groups, **kw):
        calls["batch"].append(len(groups))
        if len(groups) > 4:
            raise RuntimeError("TPU worker process crashed or restarted")
        return (
            [("le", g[0]) for g in groups],
            [("ls", g[0]) for g in groups],
            [("an", g[0]) for g in groups],
            {"loss": 0.0},
        )

    def fake_single(ds, ps, de, pe, obs, **kw):
        calls["single"] += 1
        if obs[0] == 13 and not calls["single_failed_once"]:
            calls["single_failed_once"] = True
            raise RuntimeError("TPU worker process crashed or restarted")
        return ("le", obs[0]), ("ls", obs[0]), ("an", obs[0]), {"loss": 0.0}

    recoveries = []

    subjects = [[i] for i in range(23)]  # obs list per subject = [tag]
    le, ls, an, hist = fit_joint_batch_resilient(
        None, None, None, None, subjects,
        _batch_fn=fake_batch, _single_fn=fake_single,
        _recover_fn=lambda: recoveries.append(1) or True,
    )
    assert [x[1] for x in le] == list(range(23))
    assert [x[1] for x in ls] == list(range(23))
    assert [x[1] for x in an] == list(range(23))
    assert hist["crashes"] >= 3  # 23 -> 11+12 -> ... at least two bisections
    assert max(hist["group_sizes"]) <= 4
    assert sum(hist["group_sizes"]) == 23
    assert max(calls["batch"]) == 23 and min(calls["batch"]) >= 2
    # every crash-shaped failure (the injected errors all carry the worker-
    # crash signature) must attempt an in-process backend recovery before
    # the ladder continues (r04: retries into a dead backend are useless)
    assert len(recoveries) == hist["crashes"]


def test_fit_joint_batch_resilient_aborts_when_backend_unrecoverable():
    """Measured live (BATCHSIZE_AB_r05 S=16 crash, 2026-08-20): a worker
    crash that the in-process recovery cannot cure poisons every retry,
    and each bisection rung burns a full ~3-minute recovery ladder.  When
    ``recover_backend`` reports failure the wrapper must abort at once —
    one batch attempt, one recovery attempt, no bisection."""
    from nphm_tpu.fitting.inference import fit_joint_batch_resilient

    calls = {"batch": 0, "recover": 0}

    def fake_batch(*a, **kw):
        calls["batch"] += 1
        raise RuntimeError("TPU worker process crashed or restarted")

    def fake_recover():
        calls["recover"] += 1
        return False

    with pytest.raises(RuntimeError, match="fresh process"):
        fit_joint_batch_resilient(
            None, None, None, None, [[i] for i in range(8)],
            _batch_fn=fake_batch, _single_fn=fake_batch,
            _recover_fn=fake_recover,
        )
    assert calls["batch"] == 1 and calls["recover"] == 1


def test_fit_joint_batch_resilient_singleton_failure_reraises():
    from nphm_tpu.fitting.inference import fit_joint_batch_resilient

    def always_fail(*a, **kw):
        raise RuntimeError("TPU worker process crashed or restarted")

    with pytest.raises(RuntimeError):
        fit_joint_batch_resilient(
            None, None, None, None, [[0]],
            _batch_fn=always_fail, _single_fn=always_fail,
            _recover_fn=lambda: True,
        )


def test_fit_joint_batch_resilient_passthrough_when_healthy():
    from nphm_tpu.fitting.inference import fit_joint_batch_resilient

    def ok_batch(ds, ps, de, pe, groups, **kw):
        return (
            [g[0] for g in groups], [g[0] for g in groups],
            [g[0] for g in groups], {"loss": 1.0},
        )

    le, ls, an, hist = fit_joint_batch_resilient(
        None, None, None, None, [[1], [2], [3]], _batch_fn=ok_batch,
    )
    assert le == [1, 2, 3] and hist["crashes"] == 0
    assert hist["group_sizes"] == [3]


def test_kernel_compile_error_classification():
    """Fallback classifier (ops/fallback.py): Mosaic/Pallas/static-VMEM
    compile signatures trigger; generic runtime errors (even ones
    mentioning 'compile' or 'vmem') must NOT (ADVICE r2)."""
    from nphm_tpu.ops.fallback import kernel_compile_error

    hits = [
        RuntimeError("Mosaic failed to compile TPU kernel: only constant "
                     "accumulators supported"),
        ValueError("INTERNAL: mosaic lowering failed"),
        RuntimeError("error in pallas_call lowering"),
        RuntimeError("RESOURCE_EXHAUSTED: Ran out of memory in memory "
                     "space vmem while allocating"),
    ]
    misses = [
        RuntimeError("TPU worker process crashed or restarted"),
        RuntimeError("RESOURCE_EXHAUSTED: Ran out of memory in memory "
                     "space hbm"),
        RuntimeError("server error while compiled program was running"),
        ValueError("vmem_limit flag unknown"),  # mentions vmem, not the phrase
        RuntimeError("NaN guard tripped"),
    ]
    for e in hits:
        assert kernel_compile_error(e), e
    for e in misses:
        assert not kernel_compile_error(e), e


def test_backend_crash_error_classification():
    """Worker-crash classifier (ops/fallback.py): only dead-backend shapes
    trigger in-process recovery; program bugs and OOMs must not."""
    from nphm_tpu.ops.fallback import backend_crash_error

    hits = [
        RuntimeError("UNAVAILABLE: TPU worker process crashed or restarted."
                     " This can be caused by a kernel fault"),
        RuntimeError("jax.errors.JaxRuntimeError: UNAVAILABLE: connection"),
    ]
    misses = [
        RuntimeError("RESOURCE_EXHAUSTED: Ran out of memory in memory "
                     "space hbm"),
        ValueError("shapes do not match"),
        RuntimeError("Mosaic failed to compile TPU kernel"),
        RuntimeError("NaN guard tripped"),
    ]
    for e in hits:
        assert backend_crash_error(e), e
    for e in misses:
        assert not backend_crash_error(e), e


def test_staged_memoized_kernel_fallback():
    """VERDICT r4 items 1-2: a kernel-compile failure walks a downgrade
    ladder — search off (fit kernel kept), fields off (search RESTORED),
    both off — and the winning rung is memoized per (decoders, mesh, cfg)
    so later calls skip the doomed builds."""
    from nphm_tpu.fitting.inference import (
        _KERNEL_FALLBACK_CACHE,
        _coerce_cfg,
        _run_with_xla_fallback,
    )
    from nphm_tpu.models import (
        DeformationConfig,
        NPHMConfig,
        make_deformation_decoder,
        make_nphm_decoder,
    )

    shape_dec = make_nphm_decoder(
        NPHMConfig(
            lat_dim_glob=16, lat_dim_loc=8, n_loc=7, n_symm_pairs=3,
            hidden_dim=40, n_layers=4, pos_mlp_dim=32,
        ),
        np.zeros((7, 3), np.float32),
    )
    expr_dec = make_deformation_decoder(
        DeformationConfig(
            mode="compress", lat_dim_glob_shape=16, lat_dim_loc_shape=8,
            n_loc=7, lat_dim_expr=8, lat_dim_id=8, hidden_dim=48, n_layers=4,
        )
    )
    cfg0 = _coerce_cfg(
        FittingConfig(fused_search="on", fused_shape_fields="on")
    )
    attempts = []

    def make_run(cfg):
        def run():
            attempts.append((cfg.fused_search, cfg.fused_shape_fields))
            if cfg.fused_search != "off":
                raise RuntimeError("Mosaic failed to compile TPU kernel")
            return {"ok": jnp.ones(())}
        return run

    driver = lambda run_fn: run_fn()  # noqa: E731
    _KERNEL_FALLBACK_CACHE.clear()
    out, _ = _run_with_xla_fallback(
        make_run, cfg0, shape_dec, driver, "test", decoder_expr=expr_dec
    )
    # staged: ONE downgrade (search off), fit kernel kept
    assert attempts == [("on", "on"), ("off", "on")]
    assert float(out["ok"]) == 1.0

    # memoized: the second call skips the doomed fused-search build
    attempts.clear()
    out, _ = _run_with_xla_fallback(
        make_run, cfg0, shape_dec, driver, "test", decoder_expr=expr_dec
    )
    assert attempts == [("off", "on")]

    # the memoized downgrade is keyed by MESH identity, not mesh-vs-None:
    # the same decoders/cfg on an 8-device mesh must rediscover its own
    # downgrade rather than inherit the single-device one
    devs = jax.devices()
    if len(devs) >= 8:
        mesh8 = jax.sharding.Mesh(np.array(devs[:8]), ("dp",))
        attempts.clear()
        out, _ = _run_with_xla_fallback(
            make_run, cfg0, shape_dec, driver, "test",
            mesh=mesh8, decoder_expr=expr_dec,
        )
        assert attempts == [("on", "on"), ("off", "on")]

    # only the FIELDS kernel doomed -> the ladder restores the healthy
    # search kernel after the innocent search-off rung fails too
    def make_run_fields(cfg):
        def run():
            attempts.append((cfg.fused_search, cfg.fused_shape_fields))
            if cfg.fused_shape_fields != "off":
                raise ValueError("error in pallas_call lowering")
            return {"ok": jnp.ones(())}
        return run

    attempts.clear()
    _KERNEL_FALLBACK_CACHE.clear()
    out, _ = _run_with_xla_fallback(
        make_run_fields, cfg0, shape_dec, driver, "testf",
        decoder_expr=expr_dec,
    )
    assert attempts == [("on", "on"), ("off", "on"), ("on", "off")]
    attempts.clear()
    out, _ = _run_with_xla_fallback(
        make_run_fields, cfg0, shape_dec, driver, "testf",
        decoder_expr=expr_dec,
    )
    assert attempts == [("on", "off")]  # memoized: search kernel kept

    # both kernels doomed -> walk the full ladder to (off, off)
    def make_run_both(cfg):
        def run():
            attempts.append((cfg.fused_search, cfg.fused_shape_fields))
            if cfg.fused_search != "off" or cfg.fused_shape_fields != "off":
                raise ValueError("error in pallas_call lowering")
            return {"ok": jnp.ones(())}
        return run

    attempts.clear()
    _KERNEL_FALLBACK_CACHE.clear()
    out, _ = _run_with_xla_fallback(
        make_run_both, cfg0, shape_dec, driver, "test2", decoder_expr=expr_dec
    )
    assert attempts == [
        ("on", "on"), ("off", "on"), ("on", "off"), ("off", "off")
    ]

    # a non-kernel failure must surface immediately, never downgrade
    def make_run_crash(cfg):
        def run():
            raise RuntimeError("TPU worker process crashed or restarted")
        return run

    _KERNEL_FALLBACK_CACHE.clear()
    with pytest.raises(RuntimeError, match="crashed"):
        _run_with_xla_fallback(
            make_run_crash, cfg0, shape_dec, driver, "test3",
            decoder_expr=expr_dec,
        )
    _KERNEL_FALLBACK_CACHE.clear()
