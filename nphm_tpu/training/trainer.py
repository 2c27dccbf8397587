"""Stage-1 auto-decoder trainer (identity SDF space).

Behavioral spec: reference ``src/NPHM/models/training.py`` (TrainerAutoDecoder):
per-subject latent tables (max_norm=1, N(0, 0.1/sqrt(d)) init) optimized with
SparseAdam, decoder with AdamW(weight_decay), global-norm grad clips, step-
decay LRs recomputed per epoch (latent decay gated on epoch > 1000), a
validation loop that *optimizes validation latents* with the decoder frozen,
best-val marker files, full-state checkpoints, and periodic mesh
reconstruction logging.

TPU-first: one jitted train step (loss + double-backprop eikonal + both
optimizer updates), donated carry state, dynamic LRs passed as scalars.

Multi-chip data parallelism is first-class: pass ``mesh=`` (a 1-D
``jax.sharding.Mesh``) and the train/val steps compile with the batch axis
sharded across it and params/latent tables replicated — XLA inserts the
gradient psums over ICI from the sharding annotations, so the step is
bit-compatible with the single-device program (same means, same clips, same
updates; see tests/test_parallel_training.py).  The fused Pallas training
kernel is routed through ``shard_map`` in that case, each device running the
kernel on its local batch shard.  Ragged trailing batches (batch size not
divisible by the mesh) transparently fall back to the single-device step.
"""

from __future__ import annotations

import math
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from nphm_tpu import env_paths
from nphm_tpu.ops.fallback import kernel_compile_error
from nphm_tpu.parallel.mesh import DATA_AXIS
from nphm_tpu.reconstruction.extract import make_sdf_evaluator
from nphm_tpu.training import checkpoints as ckpt
from nphm_tpu.training.latents import (
    clip_global_norm,
    renorm_rows,
    row_adam_init,
    row_adam_update,
)
from nphm_tpu.training.losses import identity_sdf_loss
from nphm_tpu.utils.logging_utils import MetricsLogger
from nphm_tpu.utils.profiling import StepTimer

RECON_BOX_MIN = (-0.4, -0.6, -0.7)
RECON_BOX_MAX = (0.4, 0.6, 0.5)


def _adamw_mask(params):
    """Exclude non-trained buffers (mean_anchors) from weight decay."""

    def mask(path, _leaf):
        return not any(
            getattr(p, "key", None) == "mean_anchors" for p in path
        )

    return jax.tree_util.tree_map_with_path(mask, params)


def _grad_norm_terms(g_params, g_table):
    """Per-layer gradient L2 norms as metric terms (the TPU-native stand-in
    for the reference's ``wandb.watch`` gradient histograms, training.py:90:
    a per-layer-norm time series in the metrics stream instead of host-side
    histogram pulls).  Device-side scalars — they ride the epoch's single
    packed metric pull (``_TermAccumulator``) at no extra sync cost.
    Opt-in via cfg ``log_grad_norms: true``."""

    def norm(tree):
        return jnp.sqrt(
            sum(jnp.sum(g * g) for g in jax.tree_util.tree_leaves(tree))
        )

    terms = {}
    for key, sub in g_params.items():
        terms[f"gnorm_{key}"] = norm(sub)
    terms["gnorm_latents"] = norm(g_table)
    return terms


class _TermAccumulator:
    """Accumulate per-step metric-term dicts ON DEVICE; one pull per epoch.

    ``float(v)`` per term is a separate device sync and even a packed
    per-step pull still blocks the host every step (each round-trip costs
    ~26 ms through the axon relay, defeating async dispatch between
    steps).  ``add`` only enqueues a stack+add on device; ``averages``
    performs the single host transfer.
    """

    def __init__(self):
        self.keys = None
        self.vec = None
        self.count = 0

    def add(self, terms: dict) -> None:
        if self.keys is None:
            self.keys = sorted(terms)
        vec = jnp.stack([terms[k] for k in self.keys])
        self.vec = vec if self.vec is None else self.vec + vec
        self.count += 1

    def averages(self) -> dict:
        if self.count == 0:
            return {}
        vals = np.asarray(self.vec) / self.count
        return {k: float(v) for k, v in zip(self.keys, vals)}


class IdentityTrainer:
    def __init__(
        self,
        decoder,
        params,
        cfg: dict,
        train_dataset,
        val_dataset,
        exp_name: str,
        exp_dir: Optional[str] = None,
        logger: Optional[MetricsLogger] = None,
        recon_resolution: int = 256,
        seed: int = 0,
        mesh=None,
    ):
        self.decoder = decoder
        self.mesh = mesh if (mesh is not None and mesh.size > 1) else None
        self.cfg = cfg["training"]
        self.lambdas = dict(self.cfg["lambdas"])
        self.train_dataset = train_dataset
        self.val_dataset = val_dataset
        self.recon_resolution = recon_resolution

        self.exp_path = os.path.join(exp_dir or env_paths.EXPERIMENT_DIR, exp_name)
        self.checkpoint_path = os.path.join(self.exp_path, "checkpoints")
        os.makedirs(self.checkpoint_path, exist_ok=True)
        self.logger = logger or MetricsLogger(log_dir=self.exp_path)

        d = decoder.lat_dim
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        std = 0.1 / math.sqrt(d)
        self.latents = jax.random.normal(k1, (len(train_dataset), d)) * std
        self.latents_val = jax.random.normal(k2, (len(val_dataset), d)) * std
        self.max_norm = 1.0

        self.params = params
        self.opt = optax.inject_hyperparams(optax.adamw)(
            learning_rate=self.cfg["lr"],
            weight_decay=self.cfg["weight_decay"],
            mask=_adamw_mask(params),
        )
        self.opt_state = self.opt.init(params)
        self.lat_state = row_adam_init(self.latents)
        self.lat_state_val = row_adam_init(self.latents_val)
        self.val_min = None
        self.log_steps = 0

        self._evaluator = None
        self._timer = StepTimer()

        # Fused Pallas training kernel (ops/pallas_train.py) for the NPHM
        # ensemble: forward + spatial gradient + custom-VJP double backprop
        # with VMEM-resident activations.  "auto" routes to it on a real
        # TPU backend; the XLA path (with remat) is the fallback and the
        # parity reference.
        # the platform the step actually runs on: the mesh's devices when
        # data-parallel, else the default backend
        plat = (
            self.mesh.devices.flat[0].platform
            if self.mesh is not None
            else jax.default_backend()
        )
        fused = self.cfg.get("fused_train_kernel", "auto")
        if fused == "auto":
            fused = getattr(decoder, "kind", None) == "nphm" and plat == "tpu"
        self._fields_fn = None
        self._fields_fn_dp = None
        if fused:
            from nphm_tpu.ops.pallas_train import apply_nphm_train_pallas

            kw = dict(self.cfg.get("fused_train_kernel_kw", {}))
            kw.setdefault("interpret", plat != "tpu")

            def fields_fn(p, pts, l):
                return apply_nphm_train_pallas(p, decoder.cfg, pts, l, **kw)

            self._fields_fn = fields_fn
            if self.mesh is not None:
                # GSPMD cannot partition a pallas_call; run the kernel
                # per-device on the local batch shard instead.  No
                # collectives inside, so autodiff (incl. the eikonal
                # grad-of-grad) transposes shard-locally.
                self._fields_fn_dp = jax.shard_map(
                    fields_fn,
                    mesh=self.mesh,
                    in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
                    out_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
                    check_vma=False,  # pallas_call out_shape carries no vma
                )

        self._build_steps()

    def _build_steps(self):
        """(Re)compile the jitted train/val steps from the current
        ``_fields_fn``/``_fields_fn_dp``.  Called once at init and again by
        ``_disable_fused`` when the Pallas kernel fails for an unusual
        architecture (e.g. tiny dims Mosaic rejects) — training then
        continues on the XLA fields path."""
        import functools

        self._fused_ok_steps = set()  # (step id, batch shapes) that succeeded

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
            _with_prec(
                functools.partial(
                    self._train_step_impl, fields_fn=self._fields_fn
                )
            ),
            donate_argnums=(0, 1, 2, 3),
        )
        self._val_step = jax.jit(
            _with_prec(
                functools.partial(self._val_step_impl, fields_fn=self._fields_fn)
            ),
            donate_argnums=(0, 1),
        )
        self._train_step_dp = self._val_step_dp = None
        if self.mesh is not None:
            repl = NamedSharding(self.mesh, P())
            data = NamedSharding(self.mesh, P(DATA_AXIS))
            dp_fields = self._fields_fn_dp
            self._train_step_dp = jax.jit(
                _with_prec(
                    functools.partial(self._train_step_impl, fields_fn=dp_fields)
                ),
                donate_argnums=(0, 1, 2, 3),
                in_shardings=(repl, repl, repl, repl, data, repl, repl),
                out_shardings=repl,
            )
            self._val_step_dp = jax.jit(
                _with_prec(
                    functools.partial(self._val_step_impl, fields_fn=dp_fields)
                ),
                donate_argnums=(0, 1),
                in_shardings=(repl, repl, repl, data, repl),
                out_shardings=repl,
            )

    def _disable_fused(self, err):
        """Fall back to the XLA fields path after a fused-kernel failure."""
        self.logger.print(
            "[trainer] fused Pallas training kernel failed "
            f"({type(err).__name__}: {str(err)[:200]}); "
            "falling back to the XLA fields path"
        )
        self._fields_fn = self._fields_fn_dp = None
        self._build_steps()

    # ------------------------------------------------------------------ steps

    def _pick(self, single, dp, batch):
        """The DP step needs the batch axis divisible by the mesh; ragged
        trailing batches run the single-device program (identical math)."""
        if dp is not None and batch["idx"].reshape(-1).shape[0] % self.mesh.size == 0:
            return dp
        return single

    def _loss(self, params, table, batch, fields_fn):
        idx = batch["idx"].reshape(-1)
        lat = table[idx]
        terms = identity_sdf_loss(
            self.decoder, params, batch, lat, training=True,
            remat=self.cfg.get("remat", True),
            fields_fn=fields_fn,
        )
        loss = sum(self.lambdas[k] * terms[k] for k in terms)
        return loss, terms

    def _train_step_impl(self, params, opt_state, table, lat_state, batch, lr,
                         lr_lat, *, fields_fn=None):
        idx = batch["idx"].reshape(-1)
        if self.max_norm is not None:
            table = renorm_rows(table, idx, self.max_norm)

        (loss, terms), (g_params, g_table) = jax.value_and_grad(
            self._loss, argnums=(0, 1), has_aux=True
        )(params, table, batch, fields_fn)

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

    def _val_step_impl(self, table, lat_state, params, batch, lr_lat, *,
                       fields_fn=None):
        idx = batch["idx"].reshape(-1)
        if self.max_norm is not None:
            table = renorm_rows(table, idx, self.max_norm)
        (loss, terms), g_table = jax.value_and_grad(
            lambda t: self._loss(params, t, batch, fields_fn), has_aux=True
        )(table)
        if self.cfg.get("grad_clip_lat") is not None:
            g_table, _ = clip_global_norm(g_table, self.cfg["grad_clip_lat"])
        table, lat_state = row_adam_update(table, g_table, lat_state, idx, lr_lat)
        terms = dict(terms)
        terms["loss"] = loss
        return table, lat_state, terms

    # --------------------------------------------------------------- schedule

    def lr_at(self, epoch: int) -> float:
        """Decoder LR under the reference's step decay (training.py:93-99)."""
        interval = self.cfg.get("lr_decay_interval")
        if not interval:
            return self.cfg["lr"]
        return self.cfg["lr"] * self.cfg["lr_decay_factor"] ** (epoch // interval)

    def lr_lat_at(self, epoch: int) -> float:
        """Latent LR decays only after epoch 1000 (training.py:101-108).

        The reference recomputes lr_lat ONLY at decay epochs that pass the
        ``epoch > 1000`` gate and holds the last-set value in between, so a
        decay event at a multiple of the interval <= 1000 never fires — the
        held value at epoch e is factor**(e // interval) only when the most
        recent multiple of the interval is itself > 1000, else the base LR
        (e.g. interval 600: epochs 1001-1199 hold the BASE lr; the first
        decay lands at 1200 with exponent 2)."""
        interval = self.cfg.get("lr_decay_interval_lat")
        if not interval:
            return self.cfg["lr_lat"]
        k = epoch // interval
        if k * interval <= 1000:
            return self.cfg["lr_lat"]
        return self.cfg["lr_lat"] * self.cfg["lr_decay_factor_lat"] ** k

    # --------------------------------------------------------------- training

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
                with self._timer.step():
                    (
                        self.params,
                        self.opt_state,
                        self.latents,
                        self.lat_state,
                        terms,
                    ) = self._run_train_step(batch, lr, lr_lat)
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
                msg += f" {k} {avg[k]:.4f}/{val.get(k, float('nan')):.4f}"
            self.logger.print(msg)
            avg.update({f"val_{k}": v for k, v in val.items()})
            avg.update(self._timer.metrics())
            # effective LRs in the log: the epoch-1000 latent decay gate
            # (reference training.py:100-104) is observable in artifacts
            avg.update({"lr": float(lr), "lr_lat": float(lr_lat)})
            self.logger.log(avg, step=epoch)

    def _run_train_step(self, batch, lr, lr_lat):
        """One train step; if the fused Pallas kernel fails to COMPILE for
        this architecture (tiny/unusual dims), rebuild on the XLA path and
        retry (compile errors surface before any buffer is donated).  Only
        the first execution of each compiled program variant is guarded,
        and only kernel-compile signatures (ops/fallback.py) trigger the
        fallback: a transient runtime failure (relay hiccup, HBM OOM,
        worker crash) on a variant's first batch re-raises — falling back
        then would wrongly blame the kernel, permanently disable it, and
        retry with buffers already donated to the failed call (a confusing
        deleted-buffer error instead of the real one)."""
        step = self._pick(self._train_step, self._train_step_dp, batch)
        # guard per COMPILED PROGRAM, not per trainer: the DP step, the
        # single-device step (ragged trailing batches), and each new batch
        # shape compile the fused kernel separately, and any of them can be
        # the variant Mosaic rejects
        key = (
            id(step),
            tuple(sorted((k, tuple(v.shape)) for k, v in batch.items())),
        )
        if self._fields_fn is None or key in self._fused_ok_steps:
            return step(
                self.params, self.opt_state, self.latents, self.lat_state,
                batch, lr, lr_lat,
            )
        try:
            out = step(
                self.params, self.opt_state, self.latents, self.lat_state,
                batch, lr, lr_lat,
            )
            self._fused_ok_steps.add(key)
            return out
        except Exception as e:  # noqa: BLE001 — relay wraps compile errors
            if not kernel_compile_error(e):
                raise
            self._disable_fused(e)
            step = self._pick(self._train_step, self._train_step_dp, batch)
            return step(
                self.params, self.opt_state, self.latents, self.lat_state,
                batch, lr, lr_lat,
            )

    def compute_val_loss(self, lr_lat):
        """Optimize validation latents with the decoder frozen
        (reference training.py:250-275)."""
        acc = _TermAccumulator()
        for batch in self.val_dataset.batch_iter(seed=0):
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            vstep = self._pick(self._val_step, self._val_step_dp, batch)
            self.latents_val, self.lat_state_val, terms = vstep(
                self.latents_val, self.lat_state_val, self.params, batch, lr_lat
            )
            acc.add(terms)
        return acc.averages()

    # ------------------------------------------------------------ persistence

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
        data = ckpt.load_checkpoint(
            self.checkpoint_path, self.cfg.get("ckpt")
        )
        if data is None:
            self.logger.print(f"No checkpoints found at {self.checkpoint_path}")
            return 0
        template = self._state_tree()
        for key, tmpl in template.items():
            restored = jax.tree.map(
                lambda t, s: jnp.asarray(s, getattr(t, "dtype", None)),
                tmpl,
                data[key],
            )
            setattr(self, key, restored)
        self.logger.print(f"Resumed from epoch {data['epoch']}")
        return int(data["epoch"])

    # ---------------------------------------------------------------- logging

    def log_recs(self, epoch: int, n_recs: int = 5):
        """Export reconstruction meshes for a few train/val latents
        (reference training.py:282-333)."""
        try:
            exp_dir = os.path.join(self.exp_path, "recs", f"epoch_{epoch}")
            os.makedirs(exp_dir, exist_ok=True)
            from nphm_tpu.reconstruction.extract import (
                _pallas_available,
                extract_mesh,
            )

            if self._evaluator is None and not _pallas_available(self.decoder):
                self._evaluator = make_sdf_evaluator(self.decoder)
            n = min(n_recs, len(self.val_dataset) // 2 or 1)
            for jj in range(n):
                step_t = (jj + n * self.log_steps) % len(self.train_dataset)
                step_v = (jj + n * self.log_steps) % len(self.val_dataset)
                for tag, table, step in (
                    ("train", self.latents, step_t),
                    ("val", self.latents_val, step_v),
                ):
                    mesh = extract_mesh(
                        self.decoder,
                        self.params,
                        table[step][None],
                        RECON_BOX_MIN,
                        RECON_BOX_MAX,
                        self.recon_resolution,
                        evaluator=self._evaluator,
                    )
                    mesh.export(os.path.join(exp_dir, f"{tag}_{step}.ply"))
            self.log_steps += 1
        except Exception as e:  # mirror the reference's defensive logging
            self.logger.print(f"[log_recs] failed: {e}")
