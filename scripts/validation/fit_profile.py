#!/usr/bin/env python
"""Component-level profile of the joint-fit step at production dims.

Decomposes the ~4.4 ms default fit step (warm3 + jstore + ift_jacobian=
"broyden" + the loss-specialized fit kernel) into its device-side parts,
each timed as a jitted lax.scan of R serialized repetitions (the verify
skill's measurement discipline: repeats inside ONE jit, relay floor swamped,
forced host transfer of a reduced scalar).

Legs:
  warp_fwd          one deformation forward [5, 1000, 3] (the search's unit)
  search_warm3      full warm search (1 residual + 3 Broyden iterations)
  search_cold15     cold-start search (autograd J init + 15 iterations)
  ift_grad          ift_correction fwd + VJP w.r.t. cond (secant J^-1)
  shape_fit_kernel  fit-kernel SDF fwd + VJP w.r.t. (pts, lat)
  shape_fit_xla     same on the pure-XLA ensemble path
  full_fit_marginal measured fit_joint steady wall (same-process anchor)

Reference hot loop being profiled: /root/reference/src/NPHM/models/
fitting.py:98-133 + iterative_root_finding.py:42-69.

Run it ALONE (one host core).  Prints one JSON line per leg.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from nphm_tpu.utils.compilation_cache import enable_persistent_cache

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nphm_tpu.fitting import FittingConfig, fit_joint  # noqa: E402
from nphm_tpu.fitting.broyden import ift_correction, search  # noqa: E402
from nphm_tpu.fitting.inference import _shape_fields_fn  # noqa: E402
from nphm_tpu.models import (  # noqa: E402
    DeformationConfig,
    NPHMConfig,
    make_deformation_decoder,
    make_nphm_decoder,
)

NB, NPP = 5, 1000  # default FittingConfig sampling: 5 obs x 1000 pts/step

rng = np.random.default_rng(0)
cfg_m = NPHMConfig()
anchors_np = (rng.normal(size=(cfg_m.n_loc, 3)) * 0.3).astype(np.float32)
decoder = make_nphm_decoder(cfg_m, anchors_np)
params = decoder.init(jax.random.PRNGKey(0))
expr = make_deformation_decoder(DeformationConfig())
p_expr = expr.init(jax.random.PRNGKey(2))

lat_shape = jnp.zeros((1, decoder.lat_dim), jnp.float32)
lat_b = jnp.broadcast_to(lat_shape, (NB, decoder.lat_dim))
cond = jnp.concatenate(
    [lat_b, jnp.zeros((NB, expr.lat_dim), jnp.float32)], axis=-1
)
anchors_b = jnp.broadcast_to(
    jnp.asarray(anchors_np)[None], (NB, cfg_m.n_loc, 3)
)
pts0 = jnp.asarray(
    rng.normal(size=(NB, NPP, 3)).astype(np.float32) * 0.3
)
eye_j = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (NB, NPP, 3, 3))


def timed(name, fn, out_reduce, r):
    jfn = jax.jit(fn)
    out = jfn()  # compile + warm
    np.asarray(out_reduce(out))
    t0 = time.perf_counter()
    out = jfn()
    np.asarray(out_reduce(out))
    wall = time.perf_counter() - t0
    print(json.dumps({
        "leg": name, "reps": r, "total_s": round(wall, 4),
        "ms_per_rep": round(wall / r * 1e3, 4),
    }), flush=True)


# --- warp forward ---------------------------------------------------------
R = 300

def warp_fwd():
    def body(x, _):
        delta, _a = expr.apply(p_expr, x, cond, anchors_b)
        return x + 1e-6 * delta, ()
    x, _ = jax.lax.scan(body, pts0, None, length=R)
    return jnp.sum(x)

timed("warp_fwd", warp_fwd, lambda o: o, R)

# --- warm search (1 residual + 3 iterations, carried J store) -------------
RS = 100

def search_warm3():
    def body(carry, _):
        xc, jinv = carry
        xc2, res = search(
            expr, p_expr, pts0, cond, anchors_b,
            max_steps=3, xc_init=xc, j_inv_init=jinv,
        )
        return (xc2, res["j_inv"]), ()
    (xc, jinv), _ = jax.lax.scan(body, (pts0, eye_j), None, length=RS)
    return jnp.sum(xc) + jnp.sum(jinv)

timed("search_warm3", search_warm3, lambda o: o, RS)

# --- cold search (autograd J init + 15 iterations) ------------------------
RC = 30

def search_cold15():
    def body(x, _):
        xc, _res = search(expr, p_expr, x, cond, anchors_b, max_steps=15)
        return x + 1e-6 * xc, ()
    x, _ = jax.lax.scan(body, pts0, None, length=RC)
    return jnp.sum(x)

timed("search_cold15", search_cold15, lambda o: o, RC)

# --- IFT correction fwd + VJP w.r.t. cond (secant J^-1 path) ---------------

def ift_grad():
    def one(c, xc):
        out = ift_correction(expr, p_expr, xc, c, anchors_b, j_inv=eye_j)
        return jnp.sum(out)
    g = jax.grad(one)

    def body(c, _):
        return c + 1e-6 * g(c, pts0), ()
    c, _ = jax.lax.scan(body, cond, None, length=R)
    return jnp.sum(c)

timed("ift_grad", ift_grad, lambda o: o, R)

# --- shape SDF fwd + VJP (fit kernel vs XLA) -------------------------------
fit_fields = _shape_fields_fn(decoder, FittingConfig(fused_shape_fields="on"))


def make_shape_leg(fields):
    def leg():
        def one(lat, pts):
            sdf = fields(params, pts, lat)
            return jnp.sum(jnp.abs(sdf))
        g = jax.grad(one, argnums=(0, 1))

        def body(carry, _):
            lat, pts = carry
            gl, gp = g(lat, pts)
            return (lat + 1e-6 * gl, pts + 1e-6 * gp), ()
        (lat, pts), _ = jax.lax.scan(body, (lat_b, pts0), None, length=R)
        return jnp.sum(lat) + jnp.sum(pts)
    return leg


def xla_fields(p, pts, lat):
    sdf, _ = decoder.apply(p, pts, lat, training=True)
    return sdf

timed("shape_fit_kernel", make_shape_leg(fit_fields), lambda o: o, R)
timed("shape_fit_xla", make_shape_leg(xla_fields), lambda o: o, R)

# --- full fit steady wall (same-process anchor) ----------------------------
obs = [rng.normal(size=(2500, 3)).astype(np.float32) * 0.3 for _ in range(20)]
fc = FittingConfig(n_steps=1000, log_every=10**9)
fit_joint(decoder, params, expr, p_expr, obs, cfg=fc, verbose=False)
t0 = time.perf_counter()
fit_joint(decoder, params, expr, p_expr, obs, cfg=fc, verbose=False)
steady = time.perf_counter() - t0
print(json.dumps({
    "leg": "full_fit_marginal", "reps": 1000, "total_s": round(steady, 4),
    "ms_per_rep": round(steady, 4),
}), flush=True)
