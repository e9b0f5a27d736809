"""Parity of the small shared blocks against the reference's OWN modules:
FPN aggregators (Decoder / DecoderDS), the Policy MLP, and the sine
position embedding. (reference: muvo/models/common.py:53-130, 636-678)
"""

import numpy as np
import torch

from reference_stubs import install as _install_reference_stubs

_install_reference_stubs()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from muvo.models import common as ref_common  # noqa: E402

from muvo_tpu.models import common as our_common  # noqa: E402
from muvo_tpu.training import weight_convert as WC  # noqa: E402

rng = np.random.RandomState(21)


def _perturb_bn(module):
    with torch.no_grad():
        for m in module.modules():
            if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.7, 1.4)
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.3, 0.3)


def _feature_pyramid(b, chs, sizes):
    xs_np = [rng.randn(b, h, w, c).astype(np.float32)
             for c, (h, w) in zip(chs, sizes)]
    xs_t = [torch.from_numpy(np.moveaxis(x, -1, 1).copy()) for x in xs_np]
    return xs_np, xs_t


def _run_fpn(ref_cls, our_cls, large):
    chs, sizes = (6, 10, 14), ((16, 16), (8, 8), (4, 4))
    feature_info = [{"num_chs": c} for c in chs]
    torch.manual_seed(3)
    ref = ref_cls(feature_info, out_channels=12).eval()
    _perturb_bn(ref)
    xs_np, xs_t = _feature_pyramid(2, chs, sizes)
    with torch.no_grad():
        ref_out = ref(xs_t)

    ours = our_cls(out_channels=12)
    variables = jax.jit(ours.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), [jnp.asarray(x) for x in xs_np], train=False)
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])
    state = {f"d.{k}": v.detach().numpy() for k, v in ref.state_dict().items()}
    WC._decoder_ds("d", (), state, params, stats, large=large)
    out = jax.jit(ours.apply, static_argnames=("train",))(
        {"params": params, "batch_stats": stats},
        [jnp.asarray(x) for x in xs_np], train=False)
    np.testing.assert_allclose(np.asarray(out),
                               np.moveaxis(ref_out.numpy(), 1, -1),
                               rtol=1e-4, atol=1e-4)


def test_fpn_decoder_matches_reference():
    _run_fpn(ref_common.Decoder, our_common.Decoder, large=True)


def test_fpn_decoder_ds_matches_reference():
    _run_fpn(ref_common.DecoderDS, our_common.DecoderDS, large=False)


def test_policy_matches_reference():
    torch.manual_seed(4)
    ref = ref_common.Policy(in_channels=16).eval()
    x = rng.randn(5, 16).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x)).numpy()

    ours = our_common.Policy(in_channels=16)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = jax.device_get(variables["params"])
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    for i, li in enumerate((0, 2, 4, 6)):
        params[f"Dense_{i}"]["kernel"] = sd[f"fc.{li}.weight"].T
        params[f"Dense_{i}"]["bias"] = sd[f"fc.{li}.bias"]
    out = ours.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref_out,
                               rtol=1e-5, atol=1e-6)


def test_position_embedding_sine_matches_reference():
    h, w, f = 7, 11, 32
    ref = ref_common.PositionEmbeddingSine(num_pos_feats=f, normalize=True)
    with torch.no_grad():
        # the reference only reads the input's shape
        ref_out = ref(torch.zeros(1, 3, h, w)).numpy()[0]  # (2f, h, w)
    ours = np.asarray(our_common.position_embedding_sine(h, w, f))
    np.testing.assert_allclose(ours, np.moveaxis(ref_out, 0, -1),
                               rtol=1e-5, atol=1e-5)
