"""Direct numeric parity against the reference's OWN torch modules.

The strongest offline parity proof available: import the reference's
pure-torch RSSM (muvo/models/transition.py) and losses (muvo/losses.py)
from /root/reference, copy weights through the production converter
(training/weight_convert.convert_rssm_section), and assert the JAX
implementations reproduce the reference outputs to fp32 tolerance on
random inputs. (Released-weight parity remains egress-blocked; these
tests exercise the actual reference code instead of re-implemented
primitives.)
"""

import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

REF = "/root/reference"
if REF not in sys.path:
    # append (not insert) so the reference's top-level modules (constants,
    # utils, ...) can never shadow repo imports
    sys.path.append(REF)

ref_transition = pytest.importorskip("muvo.models.transition")
ref_losses = pytest.importorskip("muvo.losses")

from muvo_tpu import losses as L  # noqa: E402
from muvo_tpu.models.rssm import RSSM  # noqa: E402
from muvo_tpu.training.weight_convert import (  # noqa: E402
    _merge_into, convert_rssm_section)

rng = np.random.RandomState(0)

RTOL, ATOL = 1e-4, 1e-5


def _t(x):
    return torch.from_numpy(np.asarray(x))


# ---------------------------------------------------------------------------
# RSSM
# ---------------------------------------------------------------------------
def test_rssm_rollout_matches_reference():
    emb_dim, act_dim, hid, state_dim, act_lat = 24, 2, 32, 16, 8
    b, s = 3, 6

    ref = ref_transition.RSSM(
        embedding_dim=emb_dim, action_dim=act_dim, hidden_state_dim=hid,
        state_dim=state_dim, action_latent_dim=act_lat, receptive_field=s,
    )
    ref.eval()

    emb = rng.randn(b, s, emb_dim).astype(np.float32)
    act = rng.randn(b, s, act_dim).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(_t(emb), _t(act), use_sample=False)

    model = RSSM(embedding_dim=emb_dim, action_dim=act_dim,
                 hidden_state_dim=hid, state_dim=state_dim,
                 action_latent_dim=act_lat, use_dropout=False)
    template = model.init(jax.random.PRNGKey(0), jnp.asarray(emb),
                          jnp.asarray(act), use_sample=False)["params"]

    state = {f"rssm.{k}": v.numpy() for k, v in ref.state_dict().items()}
    converted = {}
    convert_rssm_section(state, converted)
    params, missing = _merge_into(template, converted["rssm"])
    assert not missing, f"unconverted RSSM params: {missing}"

    out = model.apply({"params": params}, jnp.asarray(emb), jnp.asarray(act),
                      use_sample=False, training=False)

    for branch in ("prior", "posterior"):
        for key in ("hidden_state", "sample", "mu", "sigma"):
            np.testing.assert_allclose(
                np.asarray(out[branch][key]),
                ref_out[branch][key].numpy(),
                rtol=RTOL, atol=ATOL,
                err_msg=f"{branch}/{key}",
            )


def test_rssm_imagine_step_matches_reference():
    emb_dim, act_dim, hid, state_dim, act_lat = 24, 2, 32, 16, 8
    b = 4

    ref = ref_transition.RSSM(
        embedding_dim=emb_dim, action_dim=act_dim, hidden_state_dim=hid,
        state_dim=state_dim, action_latent_dim=act_lat, receptive_field=2,
    )
    ref.eval()

    h = rng.randn(b, hid).astype(np.float32)
    smp = rng.randn(b, state_dim).astype(np.float32)
    a = rng.randn(b, act_dim).astype(np.float32)
    with torch.no_grad():
        ref_out = ref.imagine_step(_t(h), _t(smp), _t(a), use_sample=False)

    model = RSSM(embedding_dim=emb_dim, action_dim=act_dim,
                 hidden_state_dim=hid, state_dim=state_dim,
                 action_latent_dim=act_lat, use_dropout=False)
    emb = np.zeros((b, 1, emb_dim), np.float32)
    act0 = np.zeros((b, 1, act_dim), np.float32)
    template = model.init(jax.random.PRNGKey(0), jnp.asarray(emb),
                          jnp.asarray(act0), use_sample=False)["params"]
    state = {f"rssm.{k}": v.numpy() for k, v in ref.state_dict().items()}
    converted = {}
    convert_rssm_section(state, converted)
    params, _ = _merge_into(template, converted["rssm"])

    out = model.apply(
        {"params": params}, jnp.asarray(h), jnp.asarray(smp), jnp.asarray(a),
        False, method=RSSM.imagine_step,
    )
    for key in ("hidden_state", "sample", "mu", "sigma"):
        np.testing.assert_allclose(
            np.asarray(out[key]), ref_out[key].numpy(),
            rtol=RTOL, atol=ATOL, err_msg=key)


# ---------------------------------------------------------------------------
# Losses (channels-first torch inputs vs channels-last JAX)
# ---------------------------------------------------------------------------
def _img_logits(b=2, s=2, c=8, h=8, w=8):  # c=8: len(SEMANTIC_SEG_WEIGHTS)
    logits = rng.randn(b, s, c, h, w).astype(np.float32)
    target = rng.randint(0, c, (b, s, h, w))
    return logits, target


def _vox_logits(b=1, s=2, c=5, x=6, y=6, z=4, ignore_frac=0.2):
    logits = rng.randn(b, s, c, x, y, z).astype(np.float32)
    target = rng.randint(0, c, (b, s, x, y, z))
    ignore = rng.rand(*target.shape) < ignore_frac
    target = np.where(ignore, 255, target)
    return logits, target


def test_segmentation_loss_matches_reference():
    logits, target = _img_logits()
    for kwargs in (
        {},
        {"use_top_k": True, "top_k_ratio": 0.3},
        {"use_weights": True},
        {"poly_one": True, "poly_one_coefficient": 0.4},
    ):
        ref = ref_losses.SegmentationLoss(is_bev=True, **kwargs)
        with torch.no_grad():
            expected = ref(_t(logits), _t(target)).item()
        weights = (jnp.asarray(ref.weights, jnp.float32)
                   if kwargs.get("use_weights") else None)
        out = L.segmentation_loss(
            jnp.asarray(np.moveaxis(logits, 2, -1)), jnp.asarray(target),
            use_top_k=kwargs.get("use_top_k", False),
            top_k_ratio=kwargs.get("top_k_ratio", 1.0),
            weights=weights,
            poly_one=kwargs.get("poly_one", False),
            poly_one_coefficient=kwargs.get("poly_one_coefficient", 0.0),
        )
        np.testing.assert_allclose(float(out), expected, rtol=1e-5,
                                   err_msg=str(kwargs))


def test_voxel_loss_matches_reference():
    logits, target = _vox_logits(c=9, ignore_frac=0.0)
    for kwargs in ({}, {"use_weights": True},
                   {"use_top_k": True, "top_k_ratio": 0.5}):
        ref = ref_losses.VoxelLoss(**kwargs)
        with torch.no_grad():
            expected = ref(_t(logits), _t(target)).item()
        weights = (jnp.asarray(ref.weights, jnp.float32)
                   if kwargs.get("use_weights") else None)
        out = L.segmentation_loss(
            jnp.asarray(np.moveaxis(logits, 2, -1)), jnp.asarray(target),
            use_top_k=kwargs.get("use_top_k", False),
            top_k_ratio=kwargs.get("top_k_ratio", 1.0),
            weights=weights,
        )
        np.testing.assert_allclose(float(out), expected, rtol=1e-5,
                                   err_msg=str(kwargs))


def test_regression_loss_matches_reference():
    pred = rng.randn(2, 3, 4).astype(np.float32)
    targ = rng.randn(2, 3, 4).astype(np.float32)
    for norm in (1, 2):
        ref = ref_losses.RegressionLoss(norm=norm)
        with torch.no_grad():
            expected = ref(_t(pred), _t(targ)).item()
        out = L.regression_loss(jnp.asarray(pred), jnp.asarray(targ),
                                norm=norm)
        np.testing.assert_allclose(float(out), expected, rtol=1e-5)


def test_spatial_regression_loss_matches_reference():
    b, s, c, h, w = 2, 2, 3, 6, 6
    pred = rng.randn(b, s, c, h, w).astype(np.float32)
    targ = rng.randn(b, s, c, h, w).astype(np.float32)
    # some ignored pixels: the reference masks where target[:, :, :1] != 255
    mask = rng.rand(b, s, 1, h, w) < 0.25
    targ = np.where(mask, 255.0, targ)
    for norm in (1, 2):
        ref = ref_losses.SpatialRegressionLoss(norm=norm)
        with torch.no_grad():
            expected = ref(_t(pred), _t(targ)).item()
        out = L.spatial_regression_loss(
            jnp.asarray(np.moveaxis(pred, 2, -1)),
            jnp.asarray(np.moveaxis(targ, 2, -1)), norm=norm)
        np.testing.assert_allclose(float(out), expected, rtol=1e-5)


def test_kl_loss_matches_reference():
    b, s, d = 2, 5, 8

    def make():
        return {
            "mu": rng.randn(b, s, d).astype(np.float32),
            "sigma": (0.1 + rng.rand(b, s, d)).astype(np.float32),
        }

    prior, posterior = make(), make()
    ref = ref_losses.KLLoss(alpha=0.75)
    with torch.no_grad():
        expected = ref(
            {k: _t(v) for k, v in prior.items()},
            {k: _t(v) for k, v in posterior.items()},
        ).item()
    out = L.kl_loss(
        {k: jnp.asarray(v) for k, v in prior.items()},
        {k: jnp.asarray(v) for k, v in posterior.items()}, alpha=0.75)
    np.testing.assert_allclose(float(out), expected, rtol=1e-5)


def test_sem_scal_loss_matches_reference():
    logits, target = _vox_logits()
    ref = ref_losses.SemScalLoss()
    with torch.no_grad():
        expected = ref(_t(logits), _t(target)).item()
    out = L.sem_scal_loss(jnp.asarray(np.moveaxis(logits, 2, -1)),
                          jnp.asarray(target))
    np.testing.assert_allclose(float(out), expected, rtol=1e-4)


def test_geo_scal_loss_matches_reference():
    logits, target = _vox_logits()
    ref = ref_losses.GeoScalLoss()
    with torch.no_grad():
        expected = ref(_t(logits), _t(target)).item()
    out = L.geo_scal_loss(jnp.asarray(np.moveaxis(logits, 2, -1)),
                          jnp.asarray(target))
    np.testing.assert_allclose(float(out), expected, rtol=1e-4)


def test_ssim_loss_matches_reference():
    b, s, c, h, w = 1, 2, 3, 24, 24
    pred = rng.rand(b, s, c, h, w).astype(np.float32)
    targ = rng.rand(b, s, c, h, w).astype(np.float32)
    ref = ref_losses.SSIMLoss(channel=c)
    with torch.no_grad():
        expected = ref(_t(pred), _t(targ)).item()
    out = L.ssim(jnp.asarray(np.moveaxis(pred, 2, -1)),
                 jnp.asarray(np.moveaxis(targ, 2, -1)), channel=c)
    np.testing.assert_allclose(float(out), expected, rtol=1e-4)


def test_chamfer_loss_matches_reference():
    b, s, n, d = 1, 2, 32, 3
    pred = rng.randn(b, s, n, d).astype(np.float32)
    targ = rng.randn(b, s, n, d).astype(np.float32)
    ref = ref_losses.CDLoss()
    with torch.no_grad():
        expected = ref(_t(pred), _t(targ)).item()
    out = L.chamfer_distance_loss(jnp.asarray(pred), jnp.asarray(targ))
    np.testing.assert_allclose(float(out), expected, rtol=1e-4)
