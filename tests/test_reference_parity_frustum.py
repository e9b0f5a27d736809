"""Frustum-pooling parity against the reference's OWN torch module.

Imports `muvo.models.frustum_pooling` from /root/reference (open3d/carla
stubbed — its geometry_utils import chain touches them only for functions
this test never calls), feeds the reference FrustumPooling and ours the
same image features / depth distribution / intrinsics / pose, and asserts
equal BEV grids — including the `.long()` trunc-toward-zero voxelisation
quirk the reference's own TODO comment acknowledges
(frustum_pooling.py:142). (reference: frustum_pooling.py:67-205,
mile.py:505-523)
"""

import numpy as np
import torch

from reference_stubs import install as _install_reference_stubs

_install_reference_stubs()

import jax.numpy as jnp  # noqa: E402

from muvo.models import frustum_pooling as ref_fp  # noqa: E402

from muvo_tpu.models.frustum import FrustumPooling  # noqa: E402

rng = np.random.RandomState(7)


def _camera(b, fh, fw, downsample):
    og_h, og_w = fh * downsample, fw * downsample
    K = np.zeros((b, 3, 3), np.float32)
    K[:, 0, 0] = K[:, 1, 1] = 0.5 * og_w
    K[:, 0, 2] = og_w / 2.0
    K[:, 1, 2] = og_h / 2.0
    K[:, 2, 2] = 1.0
    pose = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))
    # camera looks +x (forward), z up — a torch-parity rotation with a
    # small tilt so voxel coords land on both sides of integer boundaries
    for bi in range(b):
        a = 0.05 * (bi + 1)
        tilt = np.array([[np.cos(a), 0, -np.sin(a)],
                         [0, 1, 0],
                         [np.sin(a), 0, np.cos(a)]], np.float32)
        cam2ego = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], np.float32)
        pose[bi, :3, :3] = tilt @ cam2ego
        pose[bi, :3, 3] = [-2.0 + bi, 0.3, 1.5]
    return K, pose


def test_frustum_pooling_matches_reference():
    size, scale, offsetx = (24, 24), 1.0, -4.0
    dbound = (1.0, 13.0, 2.0)
    downsample, b, fh, fw, c, k = 4, 2, 6, 8, 3, 3

    ours = FrustumPooling(size, scale, offsetx, dbound, downsample,
                          sparse=True, sparse_count=k)
    ref = ref_fp.FrustumPooling(size, scale, offsetx, dbound, downsample,
                                use_quickcumsum=True).eval()

    feats = rng.randn(b, fh, fw, c).astype(np.float32)
    depth_logits = rng.randn(b, fh, fw, ours.D).astype(np.float32)
    depth = np.asarray(jnp.asarray(depth_logits))
    depth = np.exp(depth) / np.exp(depth).sum(-1, keepdims=True)
    K, pose = _camera(b, fh, fw, downsample)

    out = np.asarray(ours(jnp.asarray(feats), jnp.asarray(depth),
                          jnp.asarray(K), jnp.asarray(pose)))

    # reference input: depth (x) feature outer product, cam dim added,
    # (B, 1, D, H, W, C) — mile.py:508-523. The top-k mask must be the
    # same selection ours makes.
    mask = np.asarray(ours.depth_mask(jnp.asarray(depth)))  # (B, fH, fW, D)
    mask_t = torch.from_numpy(np.moveaxis(mask, -1, 1).copy())  # (B, D, H, W)
    feats_t = torch.from_numpy(np.moveaxis(feats, -1, 1).copy())
    depth_t = torch.from_numpy(np.moveaxis(depth, -1, 1).copy())
    x = depth_t.unsqueeze(1) * feats_t.unsqueeze(2)  # (B, C, D, H, W)
    x = x.unsqueeze(1).permute(0, 1, 3, 4, 5, 2)  # (B, 1, D, H, W, C)
    with torch.no_grad():
        ref_out = ref(x, torch.from_numpy(K).unsqueeze(1),
                      torch.from_numpy(pose).unsqueeze(1), mask_t)

    # reference: (B, C*nz, nx1, nx0) -> NHWC; ours: (B, nx1, nx0, nz*C)
    ref_np = np.moveaxis(ref_out.numpy(), 1, -1)
    assert np.abs(out).sum() > 0  # the scene must actually hit the grid
    np.testing.assert_allclose(out, ref_np, rtol=1e-4, atol=1e-3)


def test_frustum_trunc_quirk_points_in_minus_one_zero():
    """Points whose bev coords land in (-1, 0) must be KEPT at cell 0 —
    torch .long() truncates toward zero (reference frustum_pooling.py:142-148
    + its own TODO about behind-the-car projections)."""
    size, scale, offsetx = (8, 8), 1.0, 0.0
    dbound = (1.0, 3.0, 1.0)
    ours = FrustumPooling(size, scale, offsetx, dbound, downsample=1,
                          sparse=False)
    ref = ref_fp.FrustumPooling(size, scale, offsetx, dbound, downsample=1,
                                use_quickcumsum=True).eval()
    b, fh, fw, c = 1, 2, 2, 1
    feats = np.ones((b, fh, fw, c), np.float32)
    depth = np.full((b, fh, fw, ours.D), 1.0 / ours.D, np.float32)
    K = np.zeros((b, 3, 3), np.float32)
    K[:, 0, 0] = K[:, 1, 1] = 1.0
    K[:, 0, 2] = K[:, 1, 2] = 0.5
    K[:, 2, 2] = 1.0
    pose = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))
    # translate so some projected coords fall in (-1, 0) on the x axis
    cam2ego = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], np.float32)
    pose[:, :3, :3] = cam2ego
    pose[:, :3, 3] = [-4.3, 0.0, 0.5]

    out = np.asarray(ours(jnp.asarray(feats), jnp.asarray(depth),
                          jnp.asarray(K), jnp.asarray(pose)))
    feats_t = torch.from_numpy(np.moveaxis(feats, -1, 1).copy())
    depth_t = torch.from_numpy(np.moveaxis(depth, -1, 1).copy())
    x = (depth_t.unsqueeze(1) * feats_t.unsqueeze(2)).unsqueeze(1)
    x = x.permute(0, 1, 3, 4, 5, 2)
    with torch.no_grad():
        ref_out = ref(x, torch.from_numpy(K).unsqueeze(1),
                      torch.from_numpy(pose).unsqueeze(1))
    ref_np = np.moveaxis(ref_out.numpy(), 1, -1)
    np.testing.assert_allclose(out, ref_np, rtol=1e-5, atol=1e-6)
