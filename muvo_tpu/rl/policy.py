"""PPO actor-critic policy (Beta default), jit-friendly.

Reference: rl_birdview/models/ppo_policy.py — shared feature extractor, MLP
policy/value heads, distribution heads (alpha/beta via softplus for Beta;
mu + state-independent log_std for Gaussians).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from muvo_tpu.rl.distributions import (
    BetaDist,
    DiagGaussianDist,
    SquashedGaussianDist,
)
from muvo_tpu.rl.networks import FEATURE_EXTRACTORS


class PpoPolicy(nn.Module):
    feature_extractor: str = "xtma_cnn"
    distribution: str = "beta"
    policy_head_arch: Sequence[int] = (256, 256)
    value_head_arch: Sequence[int] = (256, 256)
    action_dim: int = 2

    def setup(self):
        self.features = FEATURE_EXTRACTORS[self.feature_extractor]()
        self.pi_layers = [nn.Dense(n, name=f"pi_fc{i}")
                          for i, n in enumerate(self.policy_head_arch)]
        self.vf_layers = [nn.Dense(n, name=f"vf_fc{i}")
                          for i, n in enumerate(self.value_head_arch)]
        self.vf_out = nn.Dense(1, name="vf_out")
        if self.distribution == "beta":
            self.dist_a = nn.Dense(self.action_dim, name="dist_alpha")
            self.dist_b = nn.Dense(self.action_dim, name="dist_beta")
        else:
            self.dist_mu = nn.Dense(self.action_dim, name="dist_mu")
            self.log_std = self.param(
                "log_std", nn.initializers.constant(-2.0), (self.action_dim,)
            )

    def _policy_latent(self, features):
        x = features
        for layer in self.pi_layers:
            x = nn.relu(layer(x))
        return x

    def _value(self, features):
        x = features
        for layer in self.vf_layers:
            x = nn.relu(layer(x))
        return self.vf_out(x)[..., 0]

    def _dist(self, latent):
        if self.distribution == "beta":
            alpha = 1.0 + jax.nn.softplus(self.dist_a(latent))
            beta = 1.0 + jax.nn.softplus(self.dist_b(latent))
            return BetaDist(alpha, beta)
        mu = self.dist_mu(latent)
        sigma = jnp.exp(jnp.clip(self.log_std, -20, 2)) * jnp.ones_like(mu)
        if self.distribution == "squashed_gaussian":
            return SquashedGaussianDist(mu, sigma)
        return DiagGaussianDist(mu, sigma)

    # ------------------------------------------------------------------
    def __call__(self, birdview, state, rng, deterministic: bool = False):
        """Rollout step: actions, values, log_probs, dist params."""
        features = self.features(birdview, state)
        latent = self._policy_latent(features)
        dist = self._dist(latent)
        values = self._value(features)
        actions = dist.mode() if deterministic else dist.sample(rng)
        log_probs = dist.log_prob(actions)
        p1, p2 = dist[0], dist[1]
        return actions, values, log_probs, p1, p2

    def evaluate_actions(self, birdview, state, actions, acc_code, steer_code):
        features = self.features(birdview, state)
        latent = self._policy_latent(features)
        dist = self._dist(latent)
        values = self._value(features)
        log_prob = dist.log_prob(actions)
        entropy_loss = dist.entropy_loss()
        exploration_loss = dist.exploration_loss(acc_code, steer_code)
        return values, log_prob, entropy_loss, exploration_loss, dist

    def forward_value(self, birdview, state):
        return self._value(self.features(birdview, state))

    def make_dist(self, p1, p2):
        if self.distribution == "beta":
            return BetaDist(p1, p2)
        if self.distribution == "squashed_gaussian":
            return SquashedGaussianDist(p1, p2)
        return DiagGaussianDist(p1, p2)
