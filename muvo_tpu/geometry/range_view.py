"""LiDAR range-view (spherical) projection and its inverse.

Semantics match the reference projection (reference:
muvo/utils/geometry_utils.py:166-244): points are first restored to the raw
CARLA sensor frame (undo y-flip and sensor offset), projected to an H x W
range image with a nearest-point-wins z-buffer, and the inverse maps a range
image back to ego-frame xyz.

Two implementations are provided:
  * ``project`` — vectorised numpy for the host input pipeline.
  * ``project_jax`` — jit-safe jnp version using a segment-min z-buffer
    (deterministic on TPU, no data-dependent shapes).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


class RangeProjector:
    def __init__(self, h=64, w=1024, fov_down=-30.0, fov_up=10.0,
                 lidar_position=(1.0, 0.0, 2.0)):
        self.fov_up = fov_up / 180.0 * np.pi
        self.fov_down = fov_down / 180.0 * np.pi
        self.fov = self.fov_up - self.fov_down
        self.h = int(h)
        self.w = int(w)
        self.lidar_position = np.asarray(lidar_position, dtype=np.float64)

    # ------------------------------------------------------------------
    def _pixel_coords(self, points_np):
        """Spherical pixel coordinates for ego-frame points (numpy)."""
        # undo the ego-frame conversion: back to the raw CARLA lidar frame
        points_carla = points_np * np.array([1.0, -1.0, 1.0])
        points_carla = points_carla - self.lidar_position

        depth = np.linalg.norm(points_carla, 2, axis=1)
        x = points_carla[:, 0]
        y = -points_carla[:, 1]  # CARLA is left-handed
        z = points_carla[:, 2]

        yaw = np.arctan2(y, x)
        with np.errstate(invalid="ignore", divide="ignore"):
            pitch = np.arcsin(np.where(depth > 0, z / np.maximum(depth, 1e-12), 0.0))

        proj_w = 0.5 * (1.0 - yaw / np.pi) * self.w
        proj_h = (1.0 - (pitch + abs(self.fov_down)) / self.fov) * self.h

        proj_w = np.clip(np.floor(proj_w), 0, self.w - 1).astype(np.int32)
        proj_h = np.clip(np.floor(proj_h), 0, self.h - 1).astype(np.int32)
        return depth, proj_h, proj_w

    def project(self, points, semantics):
        """Project ego-frame points -> (depth HxW, xyz HxWx3, sem HxW).

        Pixels with no point get depth -1, xyz 0, sem 0. Where several points
        land on one pixel the nearest wins. Uses the native C kernel when
        available (muvo_tpu/native), else the vectorised numpy path.
        """
        from muvo_tpu import native

        if native.available():
            out = native.range_project(
                np.asarray(points, np.float32), np.asarray(semantics, np.uint8),
                self.h, self.w, self.fov_down, self.fov_up,
                self.lidar_position,
            )
            if out is not None:
                return out
        return self.project_numpy(points, semantics)

    def project_numpy(self, points, semantics):
        points = np.asarray(points, dtype=np.float64)
        semantics = np.asarray(semantics)
        depth, proj_h, proj_w = self._pixel_coords(points)

        # Descending depth: the final (closest) write wins.
        order = np.argsort(depth)[::-1]
        depth = depth[order]
        proj_h = proj_h[order]
        proj_w = proj_w[order]
        points = points[order]
        semantics = semantics[order]

        range_depth = np.full((self.h, self.w), -1, dtype=np.float32)
        range_xyz = np.zeros((self.h, self.w, 3), dtype=np.float32)
        range_sem = np.zeros((self.h, self.w), dtype=np.uint8)
        range_depth[proj_h, proj_w] = depth
        range_xyz[proj_h, proj_w] = points
        range_sem[proj_h, proj_w] = semantics
        return range_depth, range_xyz, range_sem

    # ------------------------------------------------------------------
    def project_jax(self, points, semantics, valid=None):
        """Jit-safe projection for fixed-capacity padded point clouds.

        points: (N, 3) ego-frame; semantics: (N,); valid: (N,) bool mask for
        padding. Ties at identical depth resolve by lowest point index.
        """
        points = jnp.asarray(points, jnp.float32)
        n = points.shape[0]
        pts_carla = points * jnp.array([1.0, -1.0, 1.0]) - jnp.asarray(
            self.lidar_position, jnp.float32
        )
        depth = jnp.linalg.norm(pts_carla, axis=1)
        x, y, z = pts_carla[:, 0], -pts_carla[:, 1], pts_carla[:, 2]
        yaw = jnp.arctan2(y, x)
        pitch = jnp.arcsin(jnp.where(depth > 0, z / jnp.maximum(depth, 1e-12), 0.0))
        proj_w = jnp.clip(
            jnp.floor(0.5 * (1.0 - yaw / jnp.pi) * self.w), 0, self.w - 1
        ).astype(jnp.int32)
        proj_h = jnp.clip(
            jnp.floor((1.0 - (pitch + abs(self.fov_down)) / self.fov) * self.h),
            0,
            self.h - 1,
        ).astype(jnp.int32)
        pix = proj_h * self.w + proj_w

        if valid is None:
            valid = jnp.ones((n,), bool)
        # Positive IEEE-754 floats order correctly when compared as int32, so a
        # bitcast gives an exact integer z-buffer key without fp64.
        inf_bits = jnp.int32(0x7F7FFFFF)
        depth_bits = jax.lax.bitcast_convert_type(jnp.abs(depth), jnp.int32)
        key = jnp.where(valid, depth_bits, inf_bits)
        num_pix = self.h * self.w
        seg_min = jax.ops.segment_min(key, pix, num_segments=num_pix)
        hit = seg_min < inf_bits
        # Tie-break equal depths by lowest point index (deterministic).
        is_winner = valid & (key == seg_min[pix])
        idx = jnp.arange(n, dtype=jnp.int32)
        winner = jax.ops.segment_min(
            jnp.where(is_winner, idx, n), pix, num_segments=num_pix
        )
        winner = jnp.where(hit, winner, 0).astype(jnp.int32)

        range_depth = jnp.where(hit, depth[winner], -1.0).reshape(self.h, self.w)
        range_xyz = jnp.where(hit[:, None], points[winner], 0.0).reshape(
            self.h, self.w, 3
        )
        sem = jnp.asarray(semantics)
        range_sem = jnp.where(hit, sem[winner], 0).reshape(self.h, self.w)
        return range_depth.astype(jnp.float32), range_xyz.astype(jnp.float32), range_sem

    # ------------------------------------------------------------------
    def restore(self, range_depth):
        """Inverse projection: range image(s) -> ego-frame xyz + depth.

        range_depth: (..., H, W). Returns (..., H, W, 4) = (x, y, z, depth).
        Works for both numpy and jnp inputs.
        """
        xp = jnp if isinstance(range_depth, jnp.ndarray) else np
        h_idx = xp.arange(self.h, dtype=xp.float32)
        w_idx = xp.arange(self.w, dtype=xp.float32)
        proj_h = (h_idx / self.h)[:, None]
        proj_w = (w_idx / self.w)[None, :]
        pitch = (1.0 - proj_h) * self.fov - abs(self.fov_down)
        yaw = (1.0 - proj_w / 0.5) * np.pi

        depth = range_depth
        z = depth * xp.sin(pitch)
        d_cos = depth * xp.cos(pitch)
        x = d_cos * xp.cos(yaw)
        y = d_cos * xp.sin(yaw)

        points = xp.stack([x, -y, z], axis=-1)
        points = points + xp.asarray(self.lidar_position, dtype=xp.float32)
        points = points * xp.asarray([1.0, -1.0, 1.0], dtype=xp.float32)
        return xp.concatenate([points, depth[..., None]], axis=-1)
