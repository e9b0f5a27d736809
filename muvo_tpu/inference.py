"""Stateful autoregressive inference API (deployment / closed-loop).

TPU-native counterpart of Mile.deployment_forward / sim_forward (reference:
muvo/models/mile.py:852-1032): the latent state (h, sample, last action) is an
explicit on-device carry owned by a DeploymentSession; each CARLA tick either
reuses the cached state (model stride: act every ``CARLA_FPS * STRIDE_SEC``
frames) or encodes the newest frame and advances the RSSM one step. All
compute paths are jitted once; nothing round-trips through the host inside a
step except the stride counter.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from muvo_tpu.constants import CARLA_FPS
from muvo_tpu.utils.network import remove_past


class LatentCarry(NamedTuple):
    h: jnp.ndarray
    sample: jnp.ndarray
    action: jnp.ndarray


class DeploymentSession:
    def __init__(self, trainer, state, rng: Optional[jax.Array] = None):
        self.trainer = trainer
        self.cfg = trainer.cfg
        self.model = trainer.model
        self.preprocess = trainer.preprocess
        self.variables = {"params": state.params,
                          "batch_stats": state.batch_stats}
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)
        self.carry: Optional[LatentCarry] = None
        self.count = 0
        self.n_per_stride = int(CARLA_FPS * self.cfg.DATASET.STRIDE_SEC)

        model = self.model
        preprocess = self.preprocess

        @jax.jit
        def observe_update(variables, batch, carry: LatentCarry, rng):
            """Encode the last frame and advance the posterior one step."""
            pb = preprocess(batch, training=False)
            embedding_t = model.apply(variables, pb, method=model.encode_frame)
            out = model.apply(
                variables, carry.h, carry.sample, carry.action, embedding_t,
                False, rng, method=model.observe_step,
            )["posterior"]
            return LatentCarry(out["hidden_state"], out["sample"], carry.action)

        @jax.jit
        def imagine_update(variables, carry: LatentCarry, rng):
            out = model.apply(
                variables, carry.h, carry.sample, carry.action, False, rng,
                method=model.imagine_step,
            )
            return LatentCarry(out["hidden_state"], out["sample"], carry.action)

        @jax.jit
        def decode(variables, carry: LatentCarry):
            state = jnp.concatenate([carry.h, carry.sample], axis=-1)
            policy_out = model.apply(variables, state,
                                     method=model.policy_forward)
            throttle_brake, steering = jnp.split(policy_out, 2, axis=-1)
            b = state.shape[0]
            outputs = model.apply(variables, state, b, 1,
                                  method=model.decode_state)
            return {
                "throttle_brake": throttle_brake[:, None],
                "steering": steering[:, None],
                "hidden_state": carry.h,
                "sample": carry.sample,
                **outputs,
            }

        @jax.jit
        def imagine_rollout(variables, carry: LatentCarry, actions, rng):
            batch = {
                "hidden_state": carry.h,
                "sample": carry.sample,
                "throttle_brake": actions[..., :1],
                "steering": actions[..., 1:],
            }
            return model.apply(
                variables, batch, False, actions.shape[1], rng,
                method=model.imagine,
            )

        self._observe_update = observe_update
        self._imagine_update = imagine_update
        self._decode = decode
        self._imagine_rollout = imagine_rollout

    # ------------------------------------------------------------------
    def reset(self):
        self.carry = None
        self.count = 0

    def _init_carry(self, batch) -> LatentCarry:
        b = batch["image"].shape[0]
        cfg = self.cfg
        return LatentCarry(
            jnp.zeros((b, cfg.MODEL.TRANSITION.HIDDEN_STATE_DIM)),
            jnp.zeros((b, cfg.MODEL.TRANSITION.STATE_DIM)),
            jnp.zeros((b, cfg.MODEL.ACTION_DIM)),
        )

    def _next_rng(self):
        self.rng, sub = jax.random.split(self.rng)
        return sub

    # ------------------------------------------------------------------
    def deployment_forward(self, batch: Dict, is_dreaming: bool) -> Dict:
        """One CARLA tick. batch holds the most recent frames (b, s, ...)."""
        if self.count == 0:
            s = batch["image"].shape[1]
            action_t = batch["action"][:, -2] if "action" in batch else \
                jnp.concatenate(
                    [batch["throttle_brake"][:, -2], batch["steering"][:, -2]],
                    axis=-1,
                )
            last = remove_past(batch, s)
            if self.carry is None:
                self.carry = self._init_carry(batch)
            carry = LatentCarry(self.carry.h, self.carry.sample, action_t)
            if is_dreaming:
                self.carry = self._imagine_update(self.variables, carry,
                                                  self._next_rng())
            else:
                self.carry = self._observe_update(self.variables, last, carry,
                                                  self._next_rng())
            self.count = self.n_per_stride - 1
        else:
            self.count -= 1
        return self._decode(self.variables, self.carry)

    def sim_forward(self, batch: Dict, is_dreaming: bool) -> Tuple[Dict, Dict]:
        """Reference sim_forward: observe the first RF frame, then imagine the
        rest of the sequence from the cached latent."""
        rf = self.cfg.RECEPTIVE_FIELD
        if self.count == 0:
            trimmed = remove_past(batch, rf)
            action_t = jnp.concatenate(
                [trimmed["throttle_brake"][:, 0], trimmed["steering"][:, 0]],
                axis=-1,
            )
            if self.carry is None:
                self.carry = self._init_carry(batch)
                action_last = jnp.zeros_like(action_t)
            else:
                action_last = self.carry.action
            first = {k: v[:, :1] for k, v in trimmed.items()}
            carry = LatentCarry(self.carry.h, self.carry.sample, action_last)
            if is_dreaming:
                new_carry = self._imagine_update(self.variables, carry,
                                                 self._next_rng())
            else:
                new_carry = self._observe_update(self.variables, first, carry,
                                                 self._next_rng())
            self.carry = LatentCarry(new_carry.h, new_carry.sample, action_t)
            self.count = self.n_per_stride - 1
        else:
            self.count -= 1

        output = self._decode(self.variables, self.carry)
        fh = batch["image"].shape[1] - 1
        actions = jnp.concatenate(
            [batch["throttle_brake"][:, :fh], batch["steering"][:, :fh]], -1
        )
        output_imagine = self._imagine_rollout(
            self.variables, self.carry, actions, self._next_rng()
        )
        return output, output_imagine
