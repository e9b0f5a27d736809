"""PointPillars parity against the reference's OWN torch modules.

Runs the reference PointPillarNet / DynamicPointNet (common.py:682-786)
with real pure-torch scatter implementations (tests/reference_stubs.py),
converts the point-net Linear/BatchNorm1d weights, and asserts our
static-shape segment-op PointPillarNet produces the same BEV canvas —
including pillar decoration (cluster mean, pillar-centre offsets), the
per-pillar feature max, and the canvas y-flip.
"""

import numpy as np
import torch

from reference_stubs import install as _install_reference_stubs

_install_reference_stubs()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from muvo.models import common as ref_common  # noqa: E402

from muvo_tpu.models.pointpillars import PointPillarNet  # noqa: E402

rng = np.random.RandomState(11)


def test_pointpillars_matches_reference():
    num_feats = [16, 16]
    bounds = dict(min_x=-8, max_x=8, min_y=-8, max_y=8)
    ref = ref_common.PointPillarNet(
        num_input=8, num_features=num_feats, pixels_per_meter=1,
        **bounds).eval()
    # BN1d running stats: perturb from the (0, 1) init so eval-mode
    # normalisation actually exercises the converted statistics
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.7, 1.4)
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.3, 0.3)

    b, p = 2, 64
    pts = rng.uniform(-10, 10, (b, p, 3)).astype(np.float32)
    num_points = np.array([p, p - 17], np.int32)

    with torch.no_grad():
        ref_out = ref([torch.from_numpy(pts[i]) for i in range(b)],
                      torch.from_numpy(num_points))
    ref_np = np.moveaxis(ref_out.numpy(), 1, -1)  # NCHW -> NHWC

    ours = PointPillarNet(num_features=tuple(num_feats),
                          pixels_per_meter=1, **{k: float(v)
                                                 for k, v in bounds.items()})
    variables = jax.jit(ours.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.asarray(pts), jnp.asarray(num_points),
        train=False)
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    for i, li in enumerate((0, 3)):  # Sequential: Linear, BN, ReLU, ...
        params[f"fc{i}"]["kernel"] = sd[f"point_net.net.{li}.weight"].T
        params[f"fc{i}"]["bias"] = sd[f"point_net.net.{li}.bias"]
        params[f"bn{i}"]["scale"] = sd[f"point_net.net.{li + 1}.weight"]
        params[f"bn{i}"]["bias"] = sd[f"point_net.net.{li + 1}.bias"]
        stats[f"bn{i}"]["mean"] = sd[f"point_net.net.{li + 1}.running_mean"]
        stats[f"bn{i}"]["var"] = sd[f"point_net.net.{li + 1}.running_var"]

    out = jax.jit(ours.apply, static_argnames=("train",))(
        {"params": params, "batch_stats": stats},
        jnp.asarray(pts), jnp.asarray(num_points), train=False)

    assert np.abs(ref_np).sum() > 0
    np.testing.assert_allclose(np.asarray(out), ref_np,
                               rtol=1e-4, atol=1e-4)
