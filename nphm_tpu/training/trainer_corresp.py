"""Stage-2 auto-decoder trainer (forward deformation / expression space).

Behavioral spec: reference ``src/NPHM/models/training_corresp.py``: loads the
frozen stage-1 identity decoder and BOTH its latent tables from a stage-1
checkpoint (init_shape_state, :125-133), trains per-scan expression codes
(Embedding(n_scans, 200), N(0, 0.01) init, max_norm=1) against the
correspondence loss, with the same AdamW/SparseAdam/clipping/val-latent
machinery as stage 1.  Anchors conditioning comes from the frozen identity
decoder's anchor MLP (loss_functions.py:292-294).
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from nphm_tpu import env_paths
from nphm_tpu.parallel.mesh import DATA_AXIS
from nphm_tpu.models.ensemble import predict_anchors
from nphm_tpu.reconstruction.extract import (
    deform_mesh,
    make_deform_evaluator,
    make_sdf_evaluator,
)
from nphm_tpu.training import checkpoints as ckpt
from nphm_tpu.training.latents import (
    clip_global_norm,
    renorm_rows,
    row_adam_init,
    row_adam_update,
)
from nphm_tpu.training.losses import deformation_loss
from nphm_tpu.training.trainer import (
    _adamw_mask,
    _grad_norm_terms,
    _TermAccumulator,
)
from nphm_tpu.utils.logging_utils import MetricsLogger

RECON_BOX_MIN = (-0.35, -0.45, -0.15)
RECON_BOX_MAX = (0.35, 0.35, 0.35)


class DeformationTrainer:
    def __init__(
        self,
        decoder_expr,
        params_expr,
        decoder_shape,
        cfg: dict,
        train_dataset,
        val_dataset,
        exp_name: str,
        exp_dir: Optional[str] = None,
        logger: Optional[MetricsLogger] = None,
        shape_state: Optional[dict] = None,
        recon_resolution: int = 256,
        seed: int = 0,
        mesh=None,
    ):
        self.decoder = decoder_expr
        self.mesh = mesh if (mesh is not None and mesh.size > 1) else None
        self.decoder_shape = decoder_shape
        self.cfg = cfg["training"]
        self.lambdas = dict(self.cfg["lambdas"])
        self.train_dataset = train_dataset
        self.val_dataset = val_dataset
        self.recon_resolution = recon_resolution

        base = exp_dir or env_paths.EXPERIMENT_DIR
        self.exp_path = os.path.join(base, exp_name)
        self.checkpoint_path = os.path.join(self.exp_path, "checkpoints")
        os.makedirs(self.checkpoint_path, exist_ok=True)
        self.logger = logger or MetricsLogger(log_dir=self.exp_path)

        # frozen stage-1 state (decoder params + train/val identity tables)
        if shape_state is None:
            shape_ckpt_dir = os.path.join(
                base, self.cfg["shape_exp_name"], "checkpoints"
            )
            data = ckpt.load_checkpoint(shape_ckpt_dir, self.cfg.get("shape_ckpt"))
            if data is None:
                raise FileNotFoundError(
                    f"stage-1 checkpoint not found in {shape_ckpt_dir}"
                )
            shape_state = data
        self.params_shape = jax.tree.map(jnp.asarray, shape_state["params"])
        self.latents_shape = jnp.asarray(shape_state["latents"])
        self.latents_shape_val = jnp.asarray(shape_state["latents_val"])
        # frozen identity tables enter the jitted steps as captured constants
        self.latents_shape_const = self.latents_shape
        self.latents_shape_val_const = self.latents_shape_val

        E = decoder_expr.lat_dim
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        self.latents = jax.random.normal(k1, (len(train_dataset), E)) * 0.01
        self.latents_val = jax.random.normal(k2, (len(val_dataset), E)) * 0.01
        self.max_norm = 1.0

        self.params = params_expr
        self.opt = optax.inject_hyperparams(optax.adamw)(
            learning_rate=self.cfg["lr"],
            weight_decay=self.cfg["weight_decay"],
            mask=_adamw_mask(params_expr),
        )
        self.opt_state = self.opt.init(params_expr)
        self.lat_state = row_adam_init(self.latents)
        self.lat_state_val = row_adam_init(self.latents_val)
        self.val_min = None
        self.past_eval_steps = 0
        self._rng = jax.random.PRNGKey(seed + 1)
        # seeded random eval order for recon logging (reference
        # training_corresp.py:118: np.random.permutation per split) — a
        # sequential walk would only ever show the first few scans of a
        # large dataset over a 500-epoch logging interval
        perm_rng = np.random.default_rng(seed + 2)
        self.eval_perm = {
            "train": perm_rng.permutation(len(train_dataset)),
            "val": perm_rng.permutation(len(val_dataset)),
        }

        self._sdf_eval = None
        self._def_eval = None

        # matmul precision is a trace-time setting: "default" is
        # f32-equivalent (3-pass bf16); "bfloat16" trades one pass of
        # mantissa for ~3x on the ensemble's batched-small matmuls
        prec = self.cfg.get("matmul_precision", "default")

        def _with_prec(fn):
            def wrapped(*a, **kw):
                with jax.default_matmul_precision(prec):
                    return fn(*a, **kw)
            return wrapped

        self._train_step = jax.jit(
            _with_prec(self._train_step_impl), donate_argnums=(0, 1, 2, 3)
        )
        self._val_step = jax.jit(
            _with_prec(self._val_step_impl), donate_argnums=(0, 1)
        )
        # multi-chip data parallelism: batch sharded over the mesh, params
        # and latent tables replicated; XLA inserts the gradient psums from
        # the sharding annotations (same program semantics as single-device,
        # see tests/test_parallel_training.py)
        self._train_step_dp = self._val_step_dp = None
        if self.mesh is not None:
            repl = NamedSharding(self.mesh, P())
            data = NamedSharding(self.mesh, P(DATA_AXIS))
            self._train_step_dp = jax.jit(
                _with_prec(self._train_step_impl),
                donate_argnums=(0, 1, 2, 3),
                in_shardings=(repl, repl, repl, repl, data, repl, repl, repl),
                out_shardings=repl,
            )
            self._val_step_dp = jax.jit(
                _with_prec(self._val_step_impl),
                donate_argnums=(0, 1),
                in_shardings=(repl, repl, repl, data, repl, repl),
                out_shardings=repl,
            )

    def _pick(self, single, dp, batch):
        """Ragged trailing batches run the single-device program."""
        if dp is not None and batch["idx"].reshape(-1).shape[0] % self.mesh.size == 0:
            return dp
        return single

    # ------------------------------------------------------------------ loss

    def _anchors_for(self, lat_shape, batch):
        """Anchors from the frozen identity decoder when it has an anchor MLP
        (reference loss_functions.py:290-296), else dataset GT anchors."""
        if self.decoder_shape is not None and self.decoder_shape.kind == "nphm":
            return predict_anchors(
                self.params_shape, self.decoder_shape.cfg, lat_shape
            )
        return batch.get("gt_anchors")

    def _loss(self, params, table, shape_table, batch, rng, training=True):
        idx = batch["idx"].reshape(-1)
        subj = batch["subj_ind"].reshape(-1)
        lat_expr = table[idx]
        lat_shape = shape_table[subj]
        anchors = self._anchors_for(lat_shape, batch)
        terms = deformation_loss(
            self.decoder, params, batch, lat_shape, lat_expr, anchors,
            rng=rng, training=training,
        )
        loss = sum(self.lambdas[k] * terms[k] for k in terms)
        return loss, terms

    def _train_step_impl(
        self, params, opt_state, table, lat_state, batch, lr, lr_lat, rng
    ):
        idx = batch["idx"].reshape(-1)
        if self.max_norm is not None:
            table = renorm_rows(table, idx, self.max_norm)
        (loss, terms), (g_params, g_table) = jax.value_and_grad(
            lambda p, t: self._loss(p, t, self.latents_shape_const, batch, rng),
            argnums=(0, 1),
            has_aux=True,
        )(params, table)
        if self.cfg.get("grad_clip") is not None:
            g_params, _ = clip_global_norm(g_params, self.cfg["grad_clip"])
        if self.cfg.get("grad_clip_lat") is not None:
            g_table, _ = clip_global_norm(g_table, self.cfg["grad_clip_lat"])
        opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = self.opt.update(g_params, opt_state, params)
        params = optax.apply_updates(params, updates)
        table, lat_state = row_adam_update(table, g_table, lat_state, idx, lr_lat)
        terms = dict(terms)
        terms["loss"] = loss
        if self.cfg.get("log_grad_norms"):
            terms.update(_grad_norm_terms(g_params, g_table))
        return params, opt_state, table, lat_state, terms

    def _val_step_impl(self, table, lat_state, params, batch, lr_lat, rng):
        idx = batch["idx"].reshape(-1)
        if self.max_norm is not None:
            table = renorm_rows(table, idx, self.max_norm)
        (loss, terms), g_table = jax.value_and_grad(
            lambda t: self._loss(
                params, t, self.latents_shape_val_const, batch, rng, training=False
            ),
            has_aux=True,
        )(table)
        if self.cfg.get("grad_clip_lat") is not None:
            g_table, _ = clip_global_norm(g_table, self.cfg["grad_clip_lat"])
        table, lat_state = row_adam_update(table, g_table, lat_state, idx, lr_lat)
        terms = dict(terms)
        terms["loss"] = loss
        return table, lat_state, terms

    # -------------------------------------------------------------- schedule

    def lr_at(self, epoch: int) -> float:
        interval = self.cfg.get("lr_decay_interval")
        if not interval or epoch == 0:
            return self.cfg["lr"]
        return self.cfg["lr"] * self.cfg["lr_decay_factor"] ** (epoch // interval)

    def lr_lat_at(self, epoch: int) -> float:
        interval = self.cfg.get("lr_decay_interval_lat")
        if not interval or epoch == 0:
            return self.cfg["lr_lat"]
        return self.cfg["lr_lat"] * self.cfg["lr_decay_factor_lat"] ** (
            epoch // interval
        )

    # -------------------------------------------------------------- training

    def train_model(self, epochs: int):
        start = self.load_checkpoint()
        interval = self.cfg["ckpt_interval"]
        for epoch in range(start, epochs):
            t0 = time.time()
            lr = jnp.float32(self.lr_at(epoch))
            lr_lat = jnp.float32(self.lr_lat_at(epoch))
            acc = _TermAccumulator()
            for batch in self.train_dataset.batch_iter(seed=epoch):
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
                self._rng, sub = jax.random.split(self._rng)
                step = self._pick(self._train_step, self._train_step_dp, batch)
                (
                    self.params, self.opt_state, self.latents, self.lat_state, terms
                ) = step(
                    self.params, self.opt_state, self.latents, self.lat_state,
                    batch, lr, lr_lat, sub,
                )
                acc.add(terms)

            if epoch % interval == 0:
                self.save_checkpoint(epoch)
                self.log_recs(epoch)

            val = self.compute_val_loss(lr_lat)
            if "loss" in val and (self.val_min is None or val["loss"] < self.val_min):
                self.val_min = val["loss"]
                ckpt.update_val_min(self.exp_path, epoch, val["loss"])

            avg = acc.averages()
            msg = f"Epoch {epoch:5d} ({time.time()-t0:.1f}s)"
            for k in sorted(avg):
                msg += f" {k} {avg[k]:.6f}/{val.get(k, float('nan')):.6f}"
            self.logger.print(msg)
            avg.update({f"val_{k}": v for k, v in val.items()})
            avg.update({"lr": float(lr), "lr_lat": float(lr_lat)})
            self.logger.log(avg, step=epoch)

    def compute_val_loss(self, lr_lat):
        acc = _TermAccumulator()
        for batch in self.val_dataset.batch_iter(seed=0):
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            self._rng, sub = jax.random.split(self._rng)
            vstep = self._pick(self._val_step, self._val_step_dp, batch)
            self.latents_val, self.lat_state_val, terms = vstep(
                self.latents_val, self.lat_state_val, self.params, batch, lr_lat, sub
            )
            acc.add(terms)
        return acc.averages()

    # ----------------------------------------------------------- persistence

    def _state_tree(self):
        return {
            "params": self.params,
            "opt_state": self.opt_state,
            "latents": self.latents,
            "lat_state": self.lat_state,
            "latents_val": self.latents_val,
            "lat_state_val": self.lat_state_val,
        }

    def save_checkpoint(self, epoch: int):
        ckpt.save_checkpoint(self.checkpoint_path, epoch, self._state_tree())

    def load_checkpoint(self) -> int:
        data = ckpt.load_checkpoint(self.checkpoint_path, self.cfg.get("ckpt"))
        if data is None:
            self.logger.print(f"No checkpoints found at {self.checkpoint_path}")
            return 0
        template = self._state_tree()
        for key, tmpl in template.items():
            setattr(
                self,
                key,
                jax.tree.map(
                    lambda t, s: jnp.asarray(s, getattr(t, "dtype", None)),
                    tmpl,
                    data[key],
                ),
            )
        self.logger.print(f"Resumed from epoch {data['epoch']}")
        return int(data["epoch"])

    # --------------------------------------------------------------- logging

    def log_recs(self, epoch: int, mode: str = "val", n_recs: int = 5):
        """Reconstruct + deform sample scans, with GT-registration exports.

        Full parity with reference ``training_corresp.py:327-411``: for each
        of ``n_recs`` scans drawn from the seeded random ``eval_perm``, export
        up to FIVE mesh sets (exports at reference ``:381-390``):

        - ``mesh_{subj}_neutral.ply`` — marching-cubes reconstruction of the
          neutral head from the frozen identity decoder,
        - ``mesh_{subj}_e{expr}.ply`` — that reconstruction pushed through
          the trained deformation field,
        - ``gt_{subj}_e{expr}.ply`` — the GT POSED registration mesh,
        - ``reg_{subj}_neutral.ply`` — the GT NEUTRAL registration mesh,
        - ``reg_{subj}_e{expr}.ply`` — the GT neutral registration pushed
          through the deformation field (the qualitative debugging view:
          rec-independent deformation quality).

        The three GT exports need a DataManager with registration meshes;
        datasets without one (synthetic fixtures) get the first two only.
        """
        try:
            d_set = self.train_dataset if mode == "train" else self.val_dataset
            table = self.latents if mode == "train" else self.latents_val
            shape_table = (
                self.latents_shape if mode == "train" else self.latents_shape_val
            )
            if self.decoder_shape is None:
                return
            exp_dir = os.path.join(self.exp_path, "recs", f"{mode}_epoch_{epoch}")
            os.makedirs(exp_dir, exist_ok=True)
            from nphm_tpu.reconstruction.extract import (
                _pallas_available,
                extract_mesh,
            )

            if self._def_eval is None:
                self._def_eval = make_deform_evaluator(self.decoder)
            if self._sdf_eval is None and not _pallas_available(
                self.decoder_shape
            ):
                self._sdf_eval = make_sdf_evaluator(self.decoder_shape)
            manager = getattr(d_set, "manager", None)
            for jj in range(min(n_recs, len(d_set))):
                rnd = int(
                    self.eval_perm[mode][
                        (jj + self.past_eval_steps) % len(d_set)
                    ]
                )
                self.past_eval_steps += 1
                subj_ind = int(np.asarray(d_set.subject_index[rnd]))
                subj = d_set.subject_steps[rnd]
                expr = d_set.steps[rnd] if hasattr(d_set, "steps") else rnd
                lat_shape = shape_table[subj_ind][None]
                lat_expr = table[rnd][None]
                anchors = self._anchors_for(lat_shape, {})

                def _deform(m):
                    return deform_mesh(
                        m, self.decoder, self.params, lat_expr,
                        anchors=anchors, lat_shape=lat_shape,
                        evaluator=self._def_eval,
                    )

                mesh = extract_mesh(
                    self.decoder_shape,
                    self.params_shape,
                    lat_shape,
                    RECON_BOX_MIN,
                    RECON_BOX_MAX,
                    self.recon_resolution,
                    evaluator=self._sdf_eval,
                )
                mesh.export(os.path.join(exp_dir, f"mesh_{subj}_neutral.ply"))
                _deform(mesh).export(
                    os.path.join(exp_dir, f"mesh_{subj}_e{expr}.ply")
                )
                if manager is not None:
                    can_expr = d_set.neutral_expr_index[subj]
                    m_gt = manager.get_registration_mesh(
                        subject=subj, expression=can_expr
                    )
                    m_gt_posed = manager.get_registration_mesh(
                        subject=subj, expression=expr
                    )
                    m_gt_posed.export(
                        os.path.join(exp_dir, f"gt_{subj}_e{expr}.ply")
                    )
                    m_gt.export(
                        os.path.join(exp_dir, f"reg_{subj}_neutral.ply")
                    )
                    _deform(m_gt).export(
                        os.path.join(exp_dir, f"reg_{subj}_e{expr}.ply")
                    )
        except Exception as e:
            self.logger.print(f"[log_recs] failed: {e}")
