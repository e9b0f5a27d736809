"""Feature extractors + heads for the PPO expert (NHWC, flax).

Reference: rl_birdview/models/torch_layers.py (XtMaCNN, ImpalaCNN) and
ppo_policy.py head construction.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from muvo_tpu.models.layers import max_pool_torch


class XtMaCNN(nn.Module):
    """Birdview CNN + state MLP -> fused feature vector.

    (reference: torch_layers.py:12-69; VALID padding convs)
    """

    features_dim: int = 256
    states_neurons: Sequence[int] = (256,)

    @nn.compact
    def __call__(self, birdview, state):
        x = birdview
        for ch, k, s in [(8, 5, 2), (16, 5, 2), (32, 5, 2), (64, 3, 2),
                         (128, 3, 2), (256, 3, 1)]:
            x = nn.relu(nn.Conv(ch, (k, k), (s, s), padding="VALID")(x))
        x = x.reshape(x.shape[0], -1)

        s = state
        for n in self.states_neurons:
            s = nn.relu(nn.Dense(n)(s))

        x = jnp.concatenate([x, s], axis=-1)
        x = nn.relu(nn.Dense(512)(x))
        return nn.relu(nn.Dense(self.features_dim)(x))


class _ImpalaResBlock(nn.Module):
    """relu-conv-relu-conv residual block (reference torch_util.py:41-73).

    The reference's per-stack `scale` only rescales the conv WEIGHT INIT
    (NormedConv2d) — the forward is a plain `x + residual(x)`, so no
    runtime multiply exists here either (converted reference weights
    already carry the scale)."""

    channels: int

    @nn.compact
    def __call__(self, x):
        y = nn.relu(x)
        y = nn.Conv(self.channels, (3, 3), padding="SAME")(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3, 3), padding="SAME")(y)
        return x + y


class ImpalaCNN(nn.Module):
    """IMPALA-style residual CNN stack. (reference: torch_layers.py:100-160)"""

    chans: Sequence[int] = (16, 32, 32, 64, 64)
    states_neurons: Sequence[int] = (256,)
    features_dim: int = 256
    nblock: int = 2
    final_relu: bool = True

    @nn.compact
    def __call__(self, birdview, state):
        x = birdview
        for ch in self.chans:
            x = nn.Conv(ch, (3, 3), padding="SAME")(x)
            x = max_pool_torch(x, 3, 2, padding=1)
            for _ in range(self.nblock):
                x = _ImpalaResBlock(ch)(x)
        x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)

        s = state
        for n in self.states_neurons:
            s = nn.relu(nn.Dense(n)(s))
        x = jnp.concatenate([x, s], axis=-1)
        # single post-concat dense, as in the reference (torch_layers.py:
        # 119-120, 145); no hidden 512 layer exists there
        x = nn.Dense(self.features_dim)(x)
        return nn.relu(x) if self.final_relu else x


class MLPHead(nn.Module):
    arch: Sequence[int]
    out_dim: int
    out_softplus: bool = False

    @nn.compact
    def __call__(self, x):
        for n in self.arch:
            x = nn.relu(nn.Dense(n)(x))
        x = nn.Dense(self.out_dim)(x)
        return nn.softplus(x) if self.out_softplus else x


FEATURE_EXTRACTORS = {
    "xtma_cnn": XtMaCNN,
    "impala_cnn": ImpalaCNN,
}
