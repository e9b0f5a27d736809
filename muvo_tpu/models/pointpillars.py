"""PointPillars LiDAR encoder, TPU-native.

The reference (muvo/models/common.py:682-786) relies on torch_scatter's CUDA
scatter_max/mean over dynamically-unique pillar coordinates. On TPU we keep
everything static-shape: points arrive as a fixed-capacity padded tensor, and
pillar statistics use ``segment_sum``/``segment_max`` over a dense
(ny * nx) pillar index — no uniquing, no dynamic shapes.

Point feature decoration (8 features): xyz, xyz - cluster mean,
(x, y) - pillar centre. The PointNet is Linear+BN+ReLU x2 with masked batch
statistics so padding points don't pollute the normalisation.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over valid points only (mask-weighted statistics)."""

    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        # x: (N, C); mask: (N,) bool
        features = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((features,)))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((features,)))
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))

        if train:
            x32 = x.astype(jnp.float32)
            m = mask[:, None].astype(jnp.float32)
            cnt = jnp.maximum(m.sum(), 1.0)
            mean = (x32 * m).sum(axis=0) / cnt
            var = (((x32 - mean) ** 2) * m).sum(axis=0) / cnt
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value

        y = ((x.astype(jnp.float32) - mean)
             * jax.lax.rsqrt(var + self.epsilon)).astype(x.dtype)
        return y * scale + bias


class PointPillarNet(nn.Module):
    """(B, P, 3) padded points + (B,) counts -> (B, ny, nx, C) canvas."""

    num_features: Sequence[int] = (32, 32)
    min_x: float = -48.0
    max_x: float = 48.0
    min_y: float = -48.0
    max_y: float = 48.0
    pixels_per_meter: int = 5

    @property
    def nx(self) -> int:
        return int((self.max_x - self.min_x) * self.pixels_per_meter)

    @property
    def ny(self) -> int:
        return int((self.max_y - self.min_y) * self.pixels_per_meter)

    @nn.compact
    def __call__(self, points, num_points, train: bool = False):
        b, p, _ = points.shape
        nx, ny = self.nx, self.ny
        n_pillars = ny * nx

        idx = jnp.arange(p)[None, :]
        in_count = idx < num_points[:, None]
        in_bounds = (
            (points[..., 0] >= self.min_x) & (points[..., 0] < self.max_x)
            & (points[..., 1] >= self.min_y) & (points[..., 1] < self.max_y)
        )
        valid = in_count & in_bounds  # (B, P)

        cx = ((points[..., 0] - self.min_x) * self.pixels_per_meter).astype(jnp.int32)
        cy = ((points[..., 1] - self.min_y) * self.pixels_per_meter).astype(jnp.int32)
        cx = jnp.clip(cx, 0, nx - 1)
        cy = jnp.clip(cy, 0, ny - 1)
        # Reference canvas quirk (common.py:757-761): rows are the FLIPPED
        # X grid coordinate, columns the Y coordinate — scatter_points
        # indexes canvas[b, :, ny-1-coords[:,1], coords[:,2]] where
        # coords = (batch, gx, gy). Replicated (with its clamps) so a
        # converted reference checkpoint sees identically-oriented BEV
        # maps (tests/test_reference_parity_pointpillars.py).
        row = jnp.clip(ny - 1 - cx, 0, ny - 1)
        col = jnp.clip(cy, 0, nx - 1)
        pillar = row * nx + col  # (B, P)
        pillar = jnp.where(valid, pillar, n_pillars)  # padding slot

        # -- cluster means per pillar (stop-gradient region in the reference) --
        def seg_stats(pts_b, pil_b, val_b):
            m = val_b[:, None].astype(pts_b.dtype)
            sums = jax.ops.segment_sum(pts_b * m, pil_b, num_segments=n_pillars + 1)
            cnts = jax.ops.segment_sum(m[:, 0], pil_b, num_segments=n_pillars + 1)
            means = sums / jnp.maximum(cnts, 1.0)[:, None]
            return means[pil_b]  # gather back per point

        cluster_mean = jax.lax.stop_gradient(
            jax.vmap(seg_stats)(points, pillar, valid)
        )

        # Reference decoration quirk (common.py:724-726): the grid axes are
        # SWAPPED — x_centers is built from the y grid coordinate and vice
        # versa (unique_coords columns are (batch, gx, gy) but decorate
        # reads [:, 2] as x and [:, 1] as y). Replicated for parity.
        x_centers = cy.astype(points.dtype) / self.pixels_per_meter + self.min_x
        y_centers = cx.astype(points.dtype) / self.pixels_per_meter + self.min_y

        feats = jnp.concatenate(
            [
                points,
                points - cluster_mean,
                (points[..., 0] - x_centers)[..., None],
                (points[..., 1] - y_centers)[..., None],
            ],
            axis=-1,
        )  # (B, P, 8)

        # -- PointNet over flattened valid points --
        flat = feats.reshape(b * p, -1)
        flat_mask = valid.reshape(b * p)
        for i, f in enumerate(self.num_features):
            flat = nn.Dense(f, name=f"fc{i}")(flat)
            flat = MaskedBatchNorm(name=f"bn{i}")(flat, flat_mask, train)
            flat = nn.relu(flat)
        point_feats = flat.reshape(b, p, -1)
        c = point_feats.shape[-1]

        # -- max-pool per pillar, scatter to canvas --
        neg = jnp.finfo(point_feats.dtype).min

        def seg_max(feat_b, pil_b, val_b):
            masked = jnp.where(val_b[:, None], feat_b, neg)
            pooled = jax.ops.segment_max(masked, pil_b, num_segments=n_pillars + 1)
            pooled = jnp.where(pooled <= neg / 2, 0.0, pooled)
            return pooled[:n_pillars]

        canvas = jax.vmap(seg_max)(point_feats, pillar, valid)  # (B, ny*nx, C)
        # pillar ids already encode the reference's row/col layout
        # (rows = flipped gx, cols = gy) — no further flip
        return canvas.reshape(b, ny, nx, c)
