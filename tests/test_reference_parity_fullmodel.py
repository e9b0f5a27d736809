"""FULL-MODEL parity: the reference's complete Mile (muvo/models/mile.py)
vs our MuvoWorldModel, end to end, with converted weights.

The reference model is instantiated with a faithful timm-resnet18 stub
(tests/reference_stubs.py) at the flagship muvo.yml sizes, its entire
state_dict is converted by training/weight_convert.py, and both models run
the deterministic deployment path (use_sample=False) on the same
preprocessed synthetic batch. Asserted equal: the 512-d fusion embedding,
the RSSM prior/posterior moments over the sequence, the policy outputs and
every decoder head at the final step.

Heavy (full-size CPU compile, ~15 min): gated behind MUVO_FULL_PARITY=1.
Run: MUVO_FULL_PARITY=1 python -m pytest tests/test_reference_parity_fullmodel.py -q
Last full run: see PARITY.md (Direct reference parity notes).
"""

import os

import numpy as np
import pytest
import torch

from reference_stubs import install as _install_reference_stubs

_install_reference_stubs()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

pytestmark = pytest.mark.skipif(
    os.environ.get("MUVO_FULL_PARITY") != "1",
    reason="full-size model compile; set MUVO_FULL_PARITY=1 to run",
)


def _to_torch(pb):
    """Our preprocessed NHWC batch -> reference NCHW torch batch."""
    out = {}
    for k, v in pb.items():
        a = np.asarray(v)
        if a.ndim == 5:  # (b, s, H, W, C) -> (b, s, C, H, W)
            a = np.moveaxis(a, -1, 2)
        out[k] = torch.from_numpy(np.ascontiguousarray(a))
    out["action"] = torch.cat(
        [out["throttle_brake"], out["steering"]], dim=-1)
    return out


def _deploy_fn(module, batch, rng):
    """Deterministic deployment-style pass mirroring reference
    mile.py:404-489 with deployment=True (use_sample=False, last step)."""
    b, s = batch["image"].shape[:2]
    embedding = module.encode(batch, train=False)
    action = jnp.concatenate(
        [batch["throttle_brake"], batch["steering"]], axis=-1)
    state_dict = module.rssm(embedding, action, use_sample=False,
                             training=False, rng=rng)
    state = jnp.concatenate(
        [state_dict["posterior"]["hidden_state"],
         state_dict["posterior"]["sample"]], axis=-1)
    last = state[:, -1]  # (b, D)
    policy_out = module.policy(last)
    decoded = module.decode_state(last, b, 1)
    return {"embedding": embedding, "state_dict": state_dict,
            "policy": policy_out, "decoded": decoded}


@pytest.mark.parametrize("variant", ["flagship", "bev_frustum",
                                     "point_pillars", "mile_no_transformer"])
def test_full_model_matches_reference(variant):
    from muvo_tpu.config import as_static, get_cfg
    from muvo_tpu.data.synthetic import synthetic_batch
    from muvo_tpu.models.preprocess import PreProcess
    from muvo_tpu.models.world_model import MuvoWorldModel
    from muvo_tpu.training.weight_convert import (
        _merge_into,
        convert_reference_state_dict,
    )

    from muvo.models.mile import Mile

    cfg = get_cfg()
    cfg.merge_from_file("muvo_tpu/configs/muvo.yml")
    cfg.PRECISION = "32"
    cfg.RECEPTIVE_FIELD = 2
    cfg.FUTURE_HORIZON = 0
    cfg.POINTS.DEVICE_PROJECTION = False
    if variant == "bev_frustum":
        # the frustum-pooled BEV token path (mile.py:36-59, 505-523)
        cfg.MODEL.TRANSFORMER.BEV = True
    elif variant == "point_pillars":
        # PointPillars LiDAR tokens (mile.py:62-78, 529-533) — exercises
        # the swapped-axis decoration + flipped-x canvas quirks end to end
        cfg.MODEL.LIDAR.POINT_PILLAR.ENABLED = True
    elif variant == "mile_no_transformer":
        # the MILE-original path: frustum lifting + backbone_bev fusion
        # (mile.py:163-300, 616-682)
        cfg.MODEL.TRANSFORMER.ENABLED = False

    torch.manual_seed(0)
    ref = Mile(cfg).eval()
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    batch = synthetic_batch(cfg, batch_size=1, sequence_length=2)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    pre = PreProcess(cfg)
    pb = jax.jit(lambda b: pre(b, training=False))(batch)

    model = MuvoWorldModel(as_static(cfg))
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init, static_argnames=("training",))(
        {"params": jax.random.PRNGKey(0)}, pb, training=False, rng=rng)

    params, stats = convert_reference_state_dict(state, cfg)
    merged_p, missing_p = _merge_into(
        jax.device_get(variables["params"]), params)
    merged_s, missing_s = _merge_into(
        jax.device_get(variables.get("batch_stats", {})), stats)
    assert not missing_p, f"unconverted param leaves: {missing_p[:10]}"
    assert not missing_s, f"unconverted stat leaves: {missing_s[:10]}"

    ours = jax.jit(
        lambda v, b, r: model.apply(v, b, r, method=_deploy_fn)
    )({"params": merged_p, "batch_stats": merged_s}, pb, rng)

    tb = _to_torch(jax.device_get(pb))
    with torch.no_grad():
        ref_out, _ = ref(tb, deployment=True)  # mile.py returns (output, sd)

    # fusion embedding + RSSM moments over the full sequence
    for branch in ("prior", "posterior"):
        for key in ("mu", "sigma"):
            # deployment=True remove_past keeps only the LAST step
            got = np.asarray(ours["state_dict"][branch][key])[:, -1:]
            want = ref_out[branch][key].numpy()
            np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3,
                                       err_msg=f"{branch}/{key}")

    # policy on the last state
    pol = np.concatenate([ref_out["throttle_brake"].numpy(),
                          ref_out["steering"].numpy()], axis=-1)[:, 0]
    np.testing.assert_allclose(np.asarray(ours["policy"]), pol,
                               rtol=2e-3, atol=2e-3, err_msg="policy")

    # every decoder head at the final step
    for k, v in ref_out.items():
        if not (k.startswith("rgb_") or k.startswith("lidar_reconstruction_")
                or k.startswith("voxel_")):
            continue
        want = v.numpy()[:, 0]  # (b, C, ...) at the last step
        want = np.moveaxis(want, 1, -1)
        got = np.asarray(ours["decoded"][k])[:, 0]
        np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3,
                                   err_msg=k)
