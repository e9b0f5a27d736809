"""Recurrent State-Space Model (Dreamer-style), TPU-native.

Semantics match the reference RSSM (reference: muvo/models/transition.py):
  * prior:     (h, a)          -> N(mu, sigma), sigma = 2*sigmoid(x/2) + 0.1
  * posterior: (h, a, embed)   -> N(mu, sigma)
  * GRU core over h with a pre-GRU projection of the latent sample
  * posterior-dropout: with probability p (one scalar draw per timestep,
    shared across the batch, t > 0, training only) the prior sample is carried
    instead of the posterior sample (transition.py:118-123)
  * action at t is the previous action (shifted; zeros at t = 0)

The time loop is a single ``jax.lax.scan`` (the reference loops in Python),
so the whole sequence rollout compiles to one fused XLA while-loop.

Note: the reference's ``nn.LeakyReLU(True)`` calls set negative_slope=1.0
(i.e. identity) — replicated here for weight/behaviour parity.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def _identity_leaky_relu(x):
    # Reference nn.LeakyReLU(True) => negative_slope == 1.0 => identity.
    return x


class RepresentationModel(nn.Module):
    latent_dim: int
    min_std: float = 0.1

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[-1]
        x = nn.Dense(in_channels, name="fc1")(x)
        x = _identity_leaky_relu(x)
        x = nn.Dense(2 * self.latent_dim, name="fc2")(x)
        mu, log_sigma = jnp.split(x, 2, axis=-1)
        sigma = 2 * jax.nn.sigmoid(log_sigma / 2) + self.min_std
        return mu, sigma


class GRUCellLayerNorm(nn.Module):
    """Layer-normalised GRU cell (reference common.py:26-50; unused by the
    default configs but part of the building-block inventory)."""

    hidden_dim: int
    reset_bias: float = 1.0

    @nn.compact
    def __call__(self, x, h):
        xh = jnp.concatenate([x, h], axis=-1)
        update = nn.LayerNorm(name="update_norm")(
            nn.Dense(self.hidden_dim, use_bias=False, name="update")(xh)
        )
        update = jax.nn.sigmoid(update)
        reset = nn.LayerNorm(name="reset_norm")(
            nn.Dense(self.hidden_dim, use_bias=False, name="reset")(xh)
        )
        reset = jax.nn.sigmoid(reset + self.reset_bias)
        proposal = nn.LayerNorm(name="proposal_norm")(
            nn.Dense(self.hidden_dim, use_bias=False, name="proposal")(
                jnp.concatenate([x, reset * h], axis=-1)
            )
        )
        h_n = jnp.tanh(proposal)
        return (1 - update) * h_n + update * h


class GRUCell(nn.Module):
    """torch.nn.GRUCell-compatible gate maths (r, z, n ordering)."""

    hidden_dim: int

    @nn.compact
    def __call__(self, x, h):
        d = self.hidden_dim
        gates_x = nn.Dense(3 * d, name="ih")(x)
        gates_h = nn.Dense(3 * d, name="hh")(h)
        xr, xz, xn = jnp.split(gates_x, 3, axis=-1)
        hr, hz, hn = jnp.split(gates_h, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        return (1 - z) * n + z * h


class RSSM(nn.Module):
    embedding_dim: int
    action_dim: int
    hidden_state_dim: int
    state_dim: int
    action_latent_dim: int
    use_dropout: bool = True
    dropout_probability: float = 0.15

    def setup(self):
        self.pre_gru_net = nn.Dense(self.hidden_state_dim, name="pre_gru")
        self.recurrent_model = GRUCell(self.hidden_state_dim)
        self.posterior_action_fc = nn.Dense(self.action_latent_dim)
        self.prior_action_fc = nn.Dense(self.action_latent_dim)
        self.posterior_net = RepresentationModel(self.state_dim)
        self.prior_net = RepresentationModel(self.state_dim)

    # ------------------------------------------------------------------
    @staticmethod
    def sample_from_distribution(mu, sigma, use_sample, rng: Optional[jax.Array]):
        if not use_sample:
            return mu
        noise = jax.random.normal(rng, mu.shape, mu.dtype)
        return mu + sigma * noise

    def imagine_step(self, h_t, sample_t, action_t, use_sample=True,
                     rng: Optional[jax.Array] = None) -> Dict:
        latent_action = _identity_leaky_relu(self.prior_action_fc(action_t))
        gru_input = _identity_leaky_relu(self.pre_gru_net(sample_t))
        h_next = self.recurrent_model(gru_input, h_t)
        mu, sigma = self.prior_net(
            jnp.concatenate([h_next, latent_action], axis=-1)
        )
        sample = self.sample_from_distribution(mu, sigma, use_sample, rng)
        return {"hidden_state": h_next, "sample": sample, "mu": mu, "sigma": sigma}

    def observe_step(self, h_t, sample_t, action_t, embedding_t,
                     use_sample=True, rng: Optional[jax.Array] = None) -> Dict:
        rng_prior, rng_post = (
            jax.random.split(rng) if rng is not None else (None, None)
        )
        prior = self.imagine_step(h_t, sample_t, action_t, use_sample, rng_prior)
        latent_action = _identity_leaky_relu(self.posterior_action_fc(action_t))
        mu, sigma = self.posterior_net(
            jnp.concatenate([prior["hidden_state"], embedding_t, latent_action],
                            axis=-1)
        )
        sample = self.sample_from_distribution(mu, sigma, use_sample, rng_post)
        posterior = {
            "hidden_state": prior["hidden_state"],
            "sample": sample,
            "mu": mu,
            "sigma": sigma,
        }
        return {"prior": prior, "posterior": posterior}

    # ------------------------------------------------------------------
    def __call__(self, input_embedding, action, use_sample=True,
                 training: bool = False, rng: Optional[jax.Array] = None) -> Dict:
        """input_embedding: (B, S, C); action: (B, S, A).

        Returns dict(prior=..., posterior=...) each holding
        (B, S, ...) hidden_state / sample / mu / sigma.
        """
        b, s, _ = input_embedding.shape
        dtype = input_embedding.dtype
        if rng is None:
            rng = jax.random.PRNGKey(0)

        # Shifted actions: a_t := action[t-1], zeros at t=0.
        action_shifted = jnp.concatenate(
            [jnp.zeros_like(action[:, :1]), action[:, :-1]], axis=1
        )

        emb_tm = jnp.swapaxes(input_embedding, 0, 1)      # (S, B, C)
        act_tm = jnp.swapaxes(action_shifted, 0, 1)        # (S, B, A)
        step_keys = jax.random.split(rng, s + 1)
        # One scalar posterior-dropout draw per timestep (shared across batch),
        # matching reference transition.py:118.
        gate_u = jax.random.uniform(step_keys[-1], (s,))
        use_prior_flags = (
            (gate_u < self.dropout_probability)
            & (jnp.arange(s) > 0)
            if (training and self.use_dropout)
            else jnp.zeros((s,), bool)
        )

        h0 = jnp.zeros((b, self.hidden_state_dim), dtype)
        s0 = jnp.zeros((b, self.state_dim), dtype)

        def step(carry, inp):
            h_t, sample_t = carry
            emb_t, act_t, key_t, use_prior = inp
            out = self.observe_step(
                h_t, sample_t, act_t, emb_t, use_sample=use_sample, rng=key_t
            )
            next_sample = jnp.where(
                use_prior, out["prior"]["sample"], out["posterior"]["sample"]
            )
            next_h = out["prior"]["hidden_state"]
            return (next_h, next_sample), out

        if self.is_initializing():
            # Run a single step eagerly so setup-time parameter shapes exist.
            _, out0 = step((h0, s0), (emb_tm[0], act_tm[0], step_keys[0],
                                      use_prior_flags[0]))
            stacked = jax.tree_util.tree_map(
                lambda x: jnp.repeat(x[None], s, axis=0), out0
            )
        else:
            _, stacked = jax.lax.scan(
                step, (h0, s0), (emb_tm, act_tm, step_keys[:s], use_prior_flags)
            )
        # (S, B, ...) -> (B, S, ...)
        return jax.tree_util.tree_map(lambda x: jnp.swapaxes(x, 0, 1), stacked)
