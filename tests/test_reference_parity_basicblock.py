"""BasicBlock parity against the reference's OWN muvo.layers.layers module
(timm's downsample_conv faithfully stubbed — tests/reference_stubs.py).
The block is the unit of the image/lidar feature compressors
(reference mile.py:104-115). (reference: muvo/layers/layers.py:9-66)
"""

import numpy as np
import torch

from reference_stubs import install as _install_reference_stubs

_install_reference_stubs()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import pytest  # noqa: E402

from muvo.layers.layers import BasicBlock as RefBasicBlock  # noqa: E402

from muvo_tpu.models.layers import BasicBlock  # noqa: E402
from muvo_tpu.training import weight_convert as WC  # noqa: E402

rng = np.random.RandomState(31)


@pytest.mark.parametrize("stride,downsample", [(1, False), (2, True)])
def test_basic_block_matches_reference(stride, downsample):
    torch.manual_seed(5)
    cin, cout = 6, 10
    ref = RefBasicBlock(cin, cout, stride=stride,
                        downsample=True if downsample else None).eval()
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.7, 1.4)
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.3, 0.3)

    x = rng.randn(2, 8, 8, cin).astype(np.float32)
    if not downsample:
        # identity shortcut needs matching channels
        cinm = cout
        ref = RefBasicBlock(cinm, cout, stride=1, downsample=None).eval()
        x = rng.randn(2, 8, 8, cinm).astype(np.float32)
    xt = torch.from_numpy(np.moveaxis(x, -1, 1).copy())
    with torch.no_grad():
        ref_out = ref(xt).numpy()

    ours = BasicBlock(planes=cout, stride=stride, downsample=downsample)
    variables = jax.jit(ours.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])
    state = {f"b.{k}": v.detach().numpy() for k, v in ref.state_dict().items()}
    WC._basic_block("b", (), state, params, stats)
    out = jax.jit(ours.apply, static_argnames=("train",))(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out),
                               np.moveaxis(ref_out, 1, -1),
                               rtol=1e-4, atol=1e-4)
