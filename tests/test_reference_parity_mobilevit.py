"""MobileViTv2 backbone parity: the faithful torch mobilevitv2_100 stub
(tests/reference_stubs.py — timm byobnet topology, what the reference's
`timm.create_model(cfg.MODEL.LIDAR.ENCODER, …)` returns at
muvo/models/mile.py:81-85, 254-258, 269-275) vs our flax
MobileViTV2Features with a fully converted state_dict.

Covers: in_chans 3 and 4, out_indices (2,3,4) and (3,), and input sizes
that are NOT multiples of the 2x2 patch at every pyramid level (exercising
timm's bilinear align_corners=True resize-up, which is never resized back).
"""

import numpy as np
import pytest
import torch

from reference_stubs import _make_timm_mobilevitv2

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _convert(ref):
    from muvo_tpu.training.weight_convert import _mobilevit_entries

    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    # the converter sees checkpoint keys '<prefix>.stem.conv.weight'
    state = {f"enc.{k}": v for k, v in state.items()}
    params, stats = {}, {}
    _mobilevit_entries("enc", (), state, params, stats)
    return params, stats, state


@pytest.mark.parametrize(
    "in_chans,out_indices,hw",
    [(3, (2, 3, 4), (64, 96)),     # divisible everywhere
     (4, (2, 3, 4), (72, 104)),    # /8 = 9 x 13: odd -> resize path
     (3, (3,), (64, 96))],
)
def test_mobilevit_backbone_matches_timm_stub(in_chans, out_indices, hw):
    from muvo_tpu.models.backbones.mobilevit import MobileViTV2Features
    from muvo_tpu.training.weight_convert import _merge_into

    torch.manual_seed(0)
    ref = _make_timm_mobilevitv2(in_chans=in_chans,
                                 out_indices=out_indices).eval()
    params, stats, state = _convert(ref)

    rng = np.random.RandomState(0)
    x = rng.uniform(-1, 1, (2, *hw, in_chans)).astype(np.float32)

    model = MobileViTV2Features(out_indices=out_indices)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), False)
    merged_p, miss_p = _merge_into(jax.device_get(variables["params"]), params)
    merged_s, miss_s = _merge_into(
        jax.device_get(variables["batch_stats"]), stats)
    assert not miss_p, f"unconverted params: {miss_p[:8]}"
    assert not miss_s, f"unconverted stats: {miss_s[:8]}"
    # every checkpoint entry consumed (nothing silently dropped)
    n_leaves = len(jax.tree_util.tree_leaves(params)) + len(
        jax.tree_util.tree_leaves(stats))
    n_src = len([k for k in state if not k.endswith("num_batches_tracked")])
    assert n_leaves == n_src, (n_leaves, n_src)

    ours = jax.jit(
        lambda v, a: model.apply(v, a, False)
    )({"params": merged_p, "batch_stats": merged_s}, jnp.asarray(x))

    with torch.no_grad():
        want = ref(torch.from_numpy(np.moveaxis(x, -1, 1).copy()))

    assert len(ours) == len(want)
    for o, t in zip(ours, want):
        t = np.moveaxis(t.numpy(), 1, -1)
        assert o.shape == t.shape, (o.shape, t.shape)
        np.testing.assert_allclose(np.asarray(o), t, rtol=2e-4, atol=2e-4)
