"""PPO expert tests: distributions vs torch, policy shapes, GAE, full update."""

import numpy as np
import torch
import jax
import jax.numpy as jnp
import pytest

from muvo_tpu.rl.distributions import BetaDist, DiagGaussianDist, SquashedGaussianDist
from muvo_tpu.rl.policy import PpoPolicy
from muvo_tpu.rl.ppo import PPO, RolloutBuffer

rng = np.random.RandomState(3)


def test_beta_log_prob_entropy_kl_match_torch():
    a = rng.uniform(0.5, 3, (4, 2)).astype(np.float32)
    b = rng.uniform(0.5, 3, (4, 2)).astype(np.float32)
    x = rng.uniform(0.05, 0.95, (4, 2)).astype(np.float32)
    dist = BetaDist(jnp.asarray(a), jnp.asarray(b))
    tdist = torch.distributions.Beta(torch.from_numpy(a), torch.from_numpy(b))

    np.testing.assert_allclose(
        np.asarray(dist.log_prob(jnp.asarray(x))),
        tdist.log_prob(torch.from_numpy(x)).sum(-1).numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(dist.entropy()), tdist.entropy().numpy(), rtol=1e-4, atol=1e-5
    )
    a2 = rng.uniform(0.5, 3, (4, 2)).astype(np.float32)
    b2 = rng.uniform(0.5, 3, (4, 2)).astype(np.float32)
    dist2 = BetaDist(jnp.asarray(a2), jnp.asarray(b2))
    tdist2 = torch.distributions.Beta(torch.from_numpy(a2), torch.from_numpy(b2))
    np.testing.assert_allclose(
        np.asarray(dist.kl(dist2)),
        torch.distributions.kl_divergence(tdist.base_dist
                                          if hasattr(tdist, "base_dist") else tdist,
                                          tdist2).numpy(),
        rtol=1e-4, atol=1e-5,
    )


def test_beta_mode_piecewise():
    a = jnp.asarray([[2.0, 0.5], [0.5, 2.0]])
    b = jnp.asarray([[2.0, 2.0], [0.5, 0.5]])
    mode = np.asarray(BetaDist(a, b).mode())
    np.testing.assert_allclose(mode[0, 0], 0.5)   # interior (2,2)
    np.testing.assert_allclose(mode[0, 1], 0.0)   # a<=1, b>1
    np.testing.assert_allclose(mode[1, 1], 1.0)   # a>1, b<=1
    np.testing.assert_allclose(mode[1, 0], 0.5)   # mean for (0.5, 0.5)


def test_gaussian_kl_matches_torch():
    m1 = rng.randn(4, 2).astype(np.float32)
    s1 = rng.uniform(0.5, 2, (4, 2)).astype(np.float32)
    m2 = rng.randn(4, 2).astype(np.float32)
    s2 = rng.uniform(0.5, 2, (4, 2)).astype(np.float32)
    kl = np.asarray(DiagGaussianDist(jnp.asarray(m1), jnp.asarray(s1)).kl(
        DiagGaussianDist(jnp.asarray(m2), jnp.asarray(s2))))
    tkl = torch.distributions.kl_divergence(
        torch.distributions.Normal(torch.from_numpy(m1), torch.from_numpy(s1)),
        torch.distributions.Normal(torch.from_numpy(m2), torch.from_numpy(s2)),
    ).numpy()
    np.testing.assert_allclose(kl, tkl, rtol=1e-4, atol=1e-5)


def test_squashed_gaussian_log_prob():
    m = rng.randn(4, 2).astype(np.float32)
    s = rng.uniform(0.5, 1.5, (4, 2)).astype(np.float32)
    dist = SquashedGaussianDist(jnp.asarray(m), jnp.asarray(s))
    acts = np.asarray(dist.sample(jax.random.PRNGKey(0)))
    assert (np.abs(acts) <= 1).all()
    lp = np.asarray(dist.log_prob(jnp.asarray(acts)))
    assert np.isfinite(lp).all()


def _make_policy_and_batch(n=8):
    policy = PpoPolicy(feature_extractor="xtma_cnn", distribution="beta")
    birdview = jnp.asarray(rng.rand(n, 192, 192, 15).astype(np.float32))
    state = jnp.asarray(rng.rand(n, 6).astype(np.float32))
    params = policy.init(jax.random.PRNGKey(0), birdview, state,
                         jax.random.PRNGKey(1))
    return policy, params, birdview, state


def test_policy_forward_and_evaluate():
    policy, params, birdview, state = _make_policy_and_batch(4)
    actions, values, log_probs, p1, p2 = policy.apply(
        params, birdview, state, jax.random.PRNGKey(2)
    )
    assert actions.shape == (4, 2) and values.shape == (4,)
    assert (np.asarray(actions) >= 0).all() and (np.asarray(actions) <= 1).all()

    v, lp, ent, expl, dist = policy.apply(
        params, birdview, state, actions,
        jnp.zeros(4, jnp.int32), jnp.ones(4, jnp.int32),
        method=policy.evaluate_actions,
    )
    assert np.isfinite(float(ent)) and np.isfinite(float(expl))
    np.testing.assert_allclose(np.asarray(lp), np.asarray(log_probs),
                               rtol=1e-4, atol=1e-4)


def test_gae_computation():
    buf = RolloutBuffer(4, {"state": (2,)}, n_envs=1, gamma=0.5, gae_lambda=1.0)
    for t in range(4):
        buf.add({"state": np.zeros((1, 2))}, np.zeros((1, 2)),
                np.array([1.0]), np.array([0.0]), np.array([0.0]),
                np.array([0.0]), np.zeros((1, 2)), np.zeros((1, 2)))
    buf.compute_returns_and_advantage(np.array([0.0]), np.array([0.0]))
    # with V=0 everywhere and gamma=0.5, lambda=1: returns are discounted sums
    np.testing.assert_allclose(buf.returns[:, 0],
                               [1.875, 1.75, 1.5, 1.0], rtol=1e-6)


def test_ppo_update_improves_objective():
    policy, params, birdview, state = _make_policy_and_batch(8)
    ppo = PPO(policy, params, learning_rate=1e-3, batch_size=8, n_epochs=2,
              target_kl=None)
    buf = RolloutBuffer(8, {"birdview": (192, 192, 15), "state": (6,)},
                        n_envs=1)
    key = jax.random.PRNGKey(0)
    for t in range(8):
        key, sub = jax.random.split(key)
        bv = np.asarray(birdview[t % 8])[None]
        st = np.asarray(state[t % 8])[None]
        actions, values, log_probs, p1, p2 = policy.apply(
            params, jnp.asarray(bv), jnp.asarray(st), sub
        )
        buf.add({"birdview": bv, "state": st}, np.asarray(actions),
                np.array([1.0]), np.array([0.0]), np.asarray(values),
                np.asarray(log_probs), np.asarray(p1), np.asarray(p2))
    buf.compute_returns_and_advantage(np.array([0.0]), np.array([0.0]))
    summary = ppo.train(buf)
    assert summary["n_updates"] == 2
    assert np.isfinite(summary["loss"])
