"""Action distributions for the PPO expert, jit-safe and functional.

Semantics match reference rl_birdview/models/distributions.py (Beta is the
config default): log-probs summed over action dims, entropy/exploration
losses, KL divergences with the reference's directions, and the piecewise
Beta mode. Exploration "suggestions" arrive as integer codes
(0 = none, 1 = stop/turn, 2 = go/straight) instead of strings so the loss
stays jittable.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.scipy.special import betaln, digamma


def _sum_dims(x):
    return x.sum(axis=-1) if x.ndim > 1 else x.sum()


# ---------------------------------------------------------------------------
class BetaDist(NamedTuple):
    alpha: jnp.ndarray  # concentration1
    beta: jnp.ndarray   # concentration0

    def log_prob(self, actions):
        a, b = self.alpha, self.beta
        x = jnp.clip(actions, 1e-6, 1 - 1e-6)
        lp = (a - 1) * jnp.log(x) + (b - 1) * jnp.log1p(-x) - betaln(a, b)
        return _sum_dims(lp)

    def entropy(self):
        a, b = self.alpha, self.beta
        return (betaln(a, b) - (a - 1) * digamma(a) - (b - 1) * digamma(b)
                + (a + b - 2) * digamma(a + b))

    def entropy_loss(self):
        return jnp.mean(-self.entropy())

    def sample(self, rng):
        # Reparameterised Beta via two Gammas (implicit grads through
        # jax.random.gamma's built-in derivative).
        r1, r2 = jax.random.split(rng)
        g1 = jax.random.gamma(r1, self.alpha)
        g2 = jax.random.gamma(r2, self.beta)
        return g1 / (g1 + g2)

    def mode(self):
        a, b = self.alpha, self.beta
        mean = a / (a + b)
        interior = (a - 1) / jnp.maximum(a + b - 2, 1e-6)
        x = jnp.where((a > 1) & (b > 1), interior,
                      jnp.where((a <= 1) & (b > 1), 0.0,
                                jnp.where((a > 1) & (b <= 1), 1.0, mean)))
        # default 0.5 on the steering dim before masks (reference quirk,
        # immediately overwritten by one of the four cases above)
        return x

    def kl(self, other: "BetaDist"):
        """KL(self || other), summed over action dims."""
        a1, b1, a2, b2 = self.alpha, self.beta, other.alpha, other.beta
        kl = (betaln(a2, b2) - betaln(a1, b1)
              + (a1 - a2) * digamma(a1) + (b1 - b2) * digamma(b1)
              + (a2 - a1 + b2 - b1) * digamma(a1 + b1))
        return kl

    def exploration_loss(self, acc_code, steer_code):
        """KL(dist || suggestion). Codes: 0 none, acc 1=stop 2=go,
        steer 1=turn 2=straight. (reference distributions.py:236-254)"""
        # suggestion tables [beta, alpha]
        acc_beta = jnp.where(acc_code == 1, 1.5, jnp.where(acc_code == 2, 1.0, 0.0))
        acc_alpha = jnp.where(acc_code == 1, 1.0, jnp.where(acc_code == 2, 2.5, 0.0))
        st_beta = jnp.where(steer_code == 1, 1.0,
                            jnp.where(steer_code == 2, 3.0, 0.0))
        st_alpha = jnp.where(steer_code == 1, 1.0,
                             jnp.where(steer_code == 2, 3.0, 0.0))

        tgt_alpha = jnp.stack([
            jnp.where(acc_code > 0, acc_alpha, self.alpha[:, 0]),
            jnp.where(steer_code > 0, st_alpha, self.alpha[:, 1]),
        ], axis=-1)
        tgt_beta = jnp.stack([
            jnp.where(acc_code > 0, acc_beta, self.beta[:, 0]),
            jnp.where(steer_code > 0, st_beta, self.beta[:, 1]),
        ], axis=-1)
        target = BetaDist(jax.lax.stop_gradient(tgt_alpha),
                          jax.lax.stop_gradient(tgt_beta))
        return jnp.mean(self.kl(target))


# ---------------------------------------------------------------------------
class DiagGaussianDist(NamedTuple):
    mu: jnp.ndarray
    sigma: jnp.ndarray

    def log_prob(self, actions):
        var = self.sigma ** 2
        lp = -((actions - self.mu) ** 2) / (2 * var) - jnp.log(self.sigma) \
            - 0.5 * jnp.log(2 * jnp.pi)
        return _sum_dims(lp)

    def entropy(self):
        return 0.5 + 0.5 * jnp.log(2 * jnp.pi) + jnp.log(self.sigma)

    def entropy_loss(self):
        return jnp.mean(-self.entropy())

    def sample(self, rng):
        return self.mu + self.sigma * jax.random.normal(rng, self.mu.shape)

    def mode(self):
        return self.mu

    def kl(self, other: "DiagGaussianDist"):
        return (jnp.log(other.sigma / self.sigma)
                + (self.sigma ** 2 + (self.mu - other.mu) ** 2)
                / (2 * other.sigma ** 2) - 0.5)

    def exploration_loss(self, acc_code, steer_code):
        """KL(suggestion || dist) for Gaussians (reference direction)."""
        # suggestion tables [mu, log_std]
        acc_mu = jnp.where(acc_code == 1, -0.66, jnp.where(acc_code == 2, 0.66, 0.0))
        acc_ls = jnp.full_like(acc_mu, -3.0)
        st_mu = jnp.where(steer_code == 2, 3.0, 0.0)
        st_ls = jnp.where(steer_code == 1, -1.0,
                          jnp.where(steer_code == 2, 3.0, 0.0))

        mu = jnp.stack([
            jnp.where(acc_code > 0, acc_mu, self.mu[:, 0]),
            jnp.where(steer_code > 0, st_mu, self.mu[:, 1]),
        ], -1)
        sigma = jnp.stack([
            jnp.where(acc_code > 0, jnp.exp(acc_ls), self.sigma[:, 0]),
            jnp.where(steer_code > 0, jnp.exp(st_ls), self.sigma[:, 1]),
        ], -1)
        target = DiagGaussianDist(jax.lax.stop_gradient(mu),
                                  jax.lax.stop_gradient(sigma))
        return jnp.mean(target.kl(self))


class SquashedGaussianDist(NamedTuple):
    """tanh-squashed Gaussian (no closed-form entropy)."""

    mu: jnp.ndarray
    sigma: jnp.ndarray

    def log_prob(self, actions, gaussian_actions=None):
        eps = 1e-7
        if gaussian_actions is None:
            x = jnp.clip(actions, -1 + eps, 1 - eps)
            gaussian_actions = jnp.arctanh(x)
        base = DiagGaussianDist(self.mu, self.sigma).log_prob(gaussian_actions)
        correction = (2 * (jnp.log(2.0) - gaussian_actions
                           - jax.nn.softplus(-2 * gaussian_actions))).sum(-1)
        return base - correction

    def sample(self, rng):
        return jnp.tanh(self.mu + self.sigma * jax.random.normal(rng, self.mu.shape))

    def mode(self):
        return jnp.tanh(self.mu)


DISTRIBUTIONS = {
    "beta": BetaDist,
    "diag_gaussian": DiagGaussianDist,
    "squashed_gaussian": SquashedGaussianDist,
}
