"""RL feature-extractor parity against the reference's OWN torch_layers.

XtMaCNN (birdview CNN + state MLP fusion) from
/root/reference/rl_birdview/models/torch_layers.py:12-69, run with
converted weights. The torch Flatten emits (C, H, W)-major columns while
the NHWC reshape emits (H, W, C)-major — the first fused Linear's columns
are permuted accordingly during conversion.
"""

import numpy as np
import torch

from reference_stubs import install as _install_reference_stubs

_install_reference_stubs()

import gymnasium as gym  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rl_birdview.models.torch_layers import XtMaCNN as RefXtMaCNN  # noqa: E402

from muvo_tpu.rl.networks import XtMaCNN  # noqa: E402

rng = np.random.RandomState(51)


def test_xtma_cnn_matches_reference():
    torch.manual_seed(8)
    obs_space = gym.spaces.Dict({
        "birdview": gym.spaces.Box(0, 255, (3, 192, 192), np.uint8),
        "state": gym.spaces.Box(-10, 10, (6,), np.float32),
    })
    ref = RefXtMaCNN(obs_space, features_dim=256,
                     states_neurons=[256]).eval()

    b = 2
    birdview = rng.rand(b, 192, 192, 3).astype(np.float32)
    state = rng.randn(b, 6).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(np.moveaxis(birdview, -1, 1).copy()),
                      torch.from_numpy(state)).numpy()

    ours = XtMaCNN(features_dim=256, states_neurons=(256,))
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(birdview),
                          jnp.asarray(state))
    params = jax.device_get(variables["params"])
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    # six convs: cnn.{0,2,4,6,8,10} -> Conv_0..Conv_5 (OIHW -> HWIO)
    for i, ci in enumerate((0, 2, 4, 6, 8, 10)):
        params[f"Conv_{i}"]["kernel"] = np.transpose(
            sd[f"cnn.{ci}.weight"], (2, 3, 1, 0))
        params[f"Conv_{i}"]["bias"] = sd[f"cnn.{ci}.bias"]
    # state MLP
    params["Dense_0"]["kernel"] = sd["state_linear.0.weight"].T
    params["Dense_0"]["bias"] = sd["state_linear.0.bias"]
    # fused linear: permute the 1024 flatten columns (C,H,W) -> (H,W,C);
    # the trailing 256 state columns keep their order
    w0 = sd["linear.0.weight"]  # (512, 1024 + 256)
    c, h, w = 256, 2, 2
    idx_chw = np.arange(c * h * w).reshape(c, h, w)
    perm = np.transpose(idx_chw, (1, 2, 0)).reshape(-1)
    w_full = np.concatenate([w0[:, perm], w0[:, c * h * w:]], axis=1)
    params["Dense_1"]["kernel"] = w_full.T
    params["Dense_1"]["bias"] = sd["linear.0.bias"]
    params["Dense_2"]["kernel"] = sd["linear.2.weight"].T
    params["Dense_2"]["bias"] = sd["linear.2.bias"]

    out = ours.apply({"params": params}, jnp.asarray(birdview),
                     jnp.asarray(state))
    np.testing.assert_allclose(np.asarray(out), ref_out,
                               rtol=1e-4, atol=1e-4)


def test_impala_cnn_matches_reference():
    from rl_birdview.models.torch_layers import ImpalaCNN as RefImpalaCNN

    from muvo_tpu.rl.networks import ImpalaCNN

    torch.manual_seed(9)
    hw = 32
    obs_space = gym.spaces.Dict({
        "birdview": gym.spaces.Box(0, 255, (3, hw, hw), np.uint8),
        "state": gym.spaces.Box(-10, 10, (6,), np.float32),
    })
    chans = (8, 16)
    ref = RefImpalaCNN(obs_space, chans=chans, states_neurons=[32],
                       features_dim=64, nblock=2).eval()

    b = 2
    birdview = rng.rand(b, hw, hw, 3).astype(np.float32)
    state = rng.randn(b, 6).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(np.moveaxis(birdview, -1, 1).copy()),
                      torch.from_numpy(state)).numpy()

    ours = ImpalaCNN(chans=chans, states_neurons=(32,), features_dim=64,
                     nblock=2)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(birdview),
                          jnp.asarray(state))
    params = jax.device_get(variables["params"])
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    def conv(dst, src):
        params[dst]["kernel"] = np.transpose(sd[f"{src}.weight"],
                                             (2, 3, 1, 0))
        params[dst]["bias"] = sd[f"{src}.bias"]

    ci = 0  # our sequential Conv_N numbering: firstconv, then 2 per block
    bi = 0
    for si in range(len(chans)):
        conv(f"Conv_{ci}", f"stacks.{si}.firstconv"); ci += 1
        for ni in range(2):
            blk = params[f"_ImpalaResBlock_{bi}"]
            for j in range(2):
                blk[f"Conv_{j}"]["kernel"] = np.transpose(
                    sd[f"stacks.{si}.blocks.{ni}.conv{j}.weight"],
                    (2, 3, 1, 0))
                blk[f"Conv_{j}"]["bias"] = \
                    sd[f"stacks.{si}.blocks.{ni}.conv{j}.bias"]
            bi += 1
    params["Dense_0"]["kernel"] = sd["state_linear.0.weight"].T
    params["Dense_0"]["bias"] = sd["state_linear.0.bias"]
    # fused dense: permute image flatten columns (C,H,W) -> (H,W,C)
    c, h, w = chans[-1], hw // 2 ** len(chans), hw // 2 ** len(chans)
    w0 = sd["dense.weight"]
    idx_chw = np.arange(c * h * w).reshape(c, h, w)
    perm = np.transpose(idx_chw, (1, 2, 0)).reshape(-1)
    w_full = np.concatenate([w0[:, perm], w0[:, c * h * w:]], axis=1)
    params["Dense_1"]["kernel"] = w_full.T
    params["Dense_1"]["bias"] = sd["dense.bias"]

    out = ours.apply({"params": params}, jnp.asarray(birdview),
                     jnp.asarray(state))
    np.testing.assert_allclose(np.asarray(out), ref_out,
                               rtol=1e-4, atol=1e-4)
