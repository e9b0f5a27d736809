"""World-model trainer: jitted SPMD train/eval steps over a device mesh.

TPU-native counterpart of the reference Lightning module
(reference: muvo/trainer.py:25-424): one compiled train step runs on-device
preprocessing + augmentation, the model forward, all losses, and the optimizer
update. Batches shard over the mesh 'data' axis; XLA inserts the gradient
all-reduce over ICI. Mixed precision is bf16 compute / fp32 params+optimizer.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from muvo_tpu.config import as_static
from muvo_tpu.models.preprocess import PreProcess
from muvo_tpu.models.world_model import MuvoWorldModel
from muvo_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
from muvo_tpu.training.objectives import compute_loss, reduce_loss
from muvo_tpu.training.optim import make_optimizer
from muvo_tpu.utils.precision import cast_floating, compute_dtype_from_cfg


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


class WorldModelTrainer:
    def __init__(self, cfg, mesh: Optional[Mesh] = None, compute_dtype=None):
        self.cfg = cfg
        self.static_cfg = as_static(cfg)
        self.mesh = mesh if mesh is not None else make_mesh()
        self.compute_dtype = (compute_dtype if compute_dtype is not None
                              else compute_dtype_from_cfg(cfg))
        self.model = MuvoWorldModel(self.static_cfg)
        self.preprocess = PreProcess(cfg)
        self.rf = cfg.RECEPTIVE_FIELD
        self.fh = cfg.FUTURE_HORIZON
        self._tx = None
        self._train_step = None
        self._eval_step = None

    # ------------------------------------------------------------------
    def init_state(self, example_batch: Dict, seed: int = 42,
                   fast: bool = False) -> TrainState:
        """fast=True skips the jitted init (one full-graph XLA compile, very
        slow on a 1-core host) and materialises parameters straight from
        eval_shape: small random kernels, identity norms, BN var=1. Values
        differ from flax's initializers — use only where the starting point
        doesn't matter (dryruns, compile checks, throughput benches)."""
        rngs = {"params": jax.random.PRNGKey(seed)}
        pb = jax.eval_shape(
            lambda b: self.preprocess(b, training=False), example_batch
        )
        pb = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), pb
        )
        if fast:
            shapes = jax.eval_shape(
                lambda r, b: self.model.init(r, b, training=False,
                                             rng=jax.random.PRNGKey(0)),
                rngs, pb,
            )
            import numpy as np

            def fill(path, s):
                name = jax.tree_util.keystr(path)
                leaf = name.rsplit("'", 2)[-2] if "'" in name else name
                if leaf in ("var",):
                    return jnp.ones(s.shape, s.dtype)
                if leaf in ("mean", "bias"):
                    return jnp.zeros(s.shape, s.dtype)
                if leaf == "scale":
                    return jnp.ones(s.shape, s.dtype)
                # zlib.crc32: stable across processes (hash() is
                # PYTHONHASHSEED-randomised, which would desync replicated
                # params in a multi-host dryrun).
                import zlib

                r = np.random.RandomState(
                    zlib.crc32(name.encode()) % (2 ** 31))
                return jnp.asarray(
                    0.02 * r.randn(*s.shape), s.dtype)

            variables = jax.tree_util.tree_map_with_path(fill, shapes)
        else:
            variables = jax.jit(
                self.model.init, static_argnames=("training",)
            )(rngs, pb, training=False, rng=jax.random.PRNGKey(0))
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        self._tx = make_optimizer(self.cfg, params)
        opt_state = self._tx.init(params)
        state = TrainState(jnp.zeros((), jnp.int32), params, batch_stats,
                           opt_state)
        return jax.device_put(state, replicated(self.mesh))

    @property
    def tx(self):
        return self._tx

    # ------------------------------------------------------------------
    def _loss_fn(self, params, batch_stats, batch, rng, training: bool):
        rng_aug, rng_drop, rng_model = jax.random.split(rng, 3)
        pb = self.preprocess(batch, training=training, rng=rng_aug)
        # bf16 compute with fp32 master params: cast params + floating batch
        # tensors at the step boundary (normalisation stats stay fp32).
        cparams = cast_floating(params, self.compute_dtype)
        cbatch = cast_floating(pb, self.compute_dtype)
        variables = {"params": cparams, "batch_stats": batch_stats}
        if training:
            (output, _), mutated = self.model.apply(
                variables, cbatch, training=True, rng=rng_model,
                rngs={"dropout": rng_drop},
                mutable=["batch_stats"],
            )
            new_stats = cast_floating(mutated["batch_stats"], jnp.float32)
        else:
            output, _ = self.model.apply(
                variables, cbatch, training=False, rng=rng_model
            )
            new_stats = batch_stats
        # NOTE: the model output stays bf16 here — every loss upcasts at
        # its first use, so the fp32 convert fuses into the loss's own
        # reductions instead of materialising fp32 copies of the decoder
        # outputs (a wholesale cast of the output dict measured 16.8 ms of
        # pure convert traffic on the flagship step).
        losses = compute_loss(self.cfg, pb, output)
        return reduce_loss(losses), (losses, new_stats)

    def make_train_step(self, donate: bool = True):
        tx = self._tx
        assert tx is not None, "call init_state first"

        def train_step(state: TrainState, batch: Dict, rng) -> Tuple[TrainState, Dict]:
            rng = jax.random.fold_in(rng, state.step)
            grad_fn = jax.value_and_grad(self._loss_fn, has_aux=True)
            (total, (losses, new_stats)), grads = grad_fn(
                state.params, state.batch_stats, batch, rng, True
            )
            grads = cast_floating(grads, jnp.float32)
            updates, new_opt_state = tx.update(grads, state.opt_state,
                                               state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = TrainState(state.step + 1, new_params, new_stats,
                                   new_opt_state)
            metrics = {"loss": total, **losses}
            return new_state, metrics

        out_shardings = (replicated(self.mesh), replicated(self.mesh))
        in_shardings = (replicated(self.mesh), batch_sharding(self.mesh),
                        replicated(self.mesh))
        self._train_step = self._with_mesh(jax.jit(
            train_step,
            in_shardings=in_shardings,
            out_shardings=out_shardings,
            donate_argnums=(0,) if donate else (),
        ))
        return self._train_step

    def _with_mesh(self, jitted):
        """Run a jitted step with the trainer mesh in context so the model's
        `constrain()` hints (bare PartitionSpecs) bind to real mesh axes —
        without a mesh context they cannot apply at all."""

        def wrapped(*args, **kwargs):
            with jax.sharding.set_mesh(self.mesh):
                return jitted(*args, **kwargs)

        wrapped.jitted = jitted  # for lower()/cost-analysis tooling
        return wrapped

    def make_eval_step(self):
        """Eval: observe RF frames, compute recon losses, imagine FH frames.

        Mirrors reference shared_step in val/test mode (muvo/trainer.py:223-249).
        """

        def eval_step(state: TrainState, batch: Dict, rng) -> Dict:
            r1, r2 = jax.random.split(rng)
            pb = self.preprocess(batch, training=False)
            variables = {"params": cast_floating(state.params, self.compute_dtype),
                         "batch_stats": state.batch_stats}
            cpb = cast_floating(pb, self.compute_dtype)
            batch_rf = {k: v[:, : self.rf] for k, v in pb.items()}
            batch_fh = {k: v[:, self.rf:] for k, v in pb.items()}
            crf = {k: v[:, : self.rf] for k, v in cpb.items()}
            output, state_dict = self.model.apply(
                variables, crf, training=False, rng=r1
            )
            output = cast_floating(output, jnp.float32)
            losses = compute_loss(self.cfg, batch_rf, output)
            out = {"losses": losses, "output": output}
            if self.cfg.MODEL.TRANSITION.ENABLED and self.fh > 0:
                imagine_batch = {
                    "hidden_state": state_dict["posterior"]["hidden_state"][:, -1],
                    "sample": state_dict["posterior"]["sample"][:, -1],
                    "throttle_brake": cpb["throttle_brake"][:, self.rf:],
                    "steering": cpb["steering"][:, self.rf:],
                }
                output_imagine = self.model.apply(
                    variables, imagine_batch, predict_action=False,
                    future_horizon=self.fh, rng=r2,
                    method=self.model.imagine,
                )
                output_imagine = cast_floating(output_imagine, jnp.float32)
                out["losses_imagine"] = compute_loss(
                    self.cfg, batch_fh, output_imagine
                )
                out["output_imagine"] = output_imagine
            return out

        self._eval_step = self._with_mesh(jax.jit(
            eval_step,
            in_shardings=(replicated(self.mesh), batch_sharding(self.mesh),
                          replicated(self.mesh)),
        ))
        return self._eval_step

    def make_eval_split_steps(self):
        """Encode-once / imagine-many eval, mirroring the reference's test
        protocol (muvo/trainer.py:234-247): the posterior observation,
        reconstruction losses and decoders run ONCE per batch; only the
        FUTURE_HORIZON prior rollout + its losses re-run per imagination
        sample. Returns (observe_step, imagine_step), both jitted.

        observe_step(state, raw_batch, rng) -> {pb, losses, output,
            hidden_state?, sample?}  — pb is the preprocessed batch, reused
            by the caller for metric labels and passed back to imagine_step.
        imagine_step(state, pb, hidden_state, sample, rng) ->
            {losses_imagine, output_imagine}.
        """

        def observe_step(state: TrainState, batch: Dict, rng) -> Dict:
            pb = self.preprocess(batch, training=False)
            variables = {"params": cast_floating(state.params, self.compute_dtype),
                         "batch_stats": state.batch_stats}
            cpb = cast_floating(pb, self.compute_dtype)
            batch_rf = {k: v[:, : self.rf] for k, v in pb.items()}
            crf = {k: v[:, : self.rf] for k, v in cpb.items()}
            output, state_dict = self.model.apply(
                variables, crf, training=False, rng=rng
            )
            output = cast_floating(output, jnp.float32)
            out = {"pb": pb,
                   "losses": compute_loss(self.cfg, batch_rf, output),
                   "output": output}
            if self.cfg.MODEL.TRANSITION.ENABLED and self.fh > 0:
                out["hidden_state"] = (
                    state_dict["posterior"]["hidden_state"][:, -1])
                out["sample"] = state_dict["posterior"]["sample"][:, -1]
            return out

        def imagine_step(state: TrainState, pb: Dict, hidden_state, sample,
                         rng) -> Dict:
            variables = {"params": cast_floating(state.params, self.compute_dtype),
                         "batch_stats": state.batch_stats}
            cpb = cast_floating(pb, self.compute_dtype)
            batch_fh = {k: v[:, self.rf:] for k, v in pb.items()}
            imagine_batch = {
                "hidden_state": hidden_state,
                "sample": sample,
                "throttle_brake": cpb["throttle_brake"][:, self.rf:],
                "steering": cpb["steering"][:, self.rf:],
            }
            output_imagine = self.model.apply(
                variables, imagine_batch, predict_action=False,
                future_horizon=self.fh, rng=rng, method=self.model.imagine,
            )
            output_imagine = cast_floating(output_imagine, jnp.float32)
            return {
                "losses_imagine": compute_loss(self.cfg, batch_fh,
                                               output_imagine),
                "output_imagine": output_imagine,
            }

        observe = self._with_mesh(jax.jit(
            observe_step,
            in_shardings=(replicated(self.mesh), batch_sharding(self.mesh),
                          replicated(self.mesh)),
        ))
        imagine = self._with_mesh(jax.jit(imagine_step))
        return observe, imagine
