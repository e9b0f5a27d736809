"""On-device batch preprocessing: normalisation, crop, label pyramids,
augmentation. Everything is jit-safe and runs inside the compiled step —
the host pipeline only decodes files into raw arrays.

Semantics follow reference muvo/models/preprocess.py. Layout is channels-last:
image (b, s, h, w, 3) uint8 in, float out; voxel labels (b, s, X, Y, Z).

Divergence (documented): torchvision's ColorJitter applies its four ops in a
random order; here the order is fixed (brightness, contrast, saturation, hue).
This only perturbs training-time augmentation noise, not eval behaviour.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from muvo_tpu.models.layers import strided_downsample
from muvo_tpu.utils.instance import center_offset_labels


def _nearest_resize(x, out_h, out_w):
    """torch-style nearest resize on (..., h, w, c).

    Integer-factor downsampling uses strided slicing (torch nearest picks
    index floor(i * h/out) = i * factor) — gathers are slow on TPU.
    """
    h, w = x.shape[-3], x.shape[-2]
    if h % out_h == 0 and w % out_w == 0 and h >= out_h and w >= out_w:
        return strided_downsample(x, (h // out_h, w // out_w, 1))
    rows = jnp.floor(jnp.arange(out_h) * (h / out_h)).astype(jnp.int32)
    cols = jnp.floor(jnp.arange(out_w) * (w / out_w)).astype(jnp.int32)
    return x[..., rows, :, :][..., :, cols, :]


def _bilinear_resize(x, out_h, out_w):
    """jax.image.resize(linear) as two banded matmuls (exact same weights:
    rows of resize(eye) ARE the per-axis scale matrix — resize is
    separable). XLA's own integer-factor lowering emits (..., 2, ..., 2)
    reshapes whose T(2,128) layouts cost ~6 ms/step of fixup copies on the
    flagship label pyramids; the einsum form keeps clean layouts."""
    h, w = x.shape[-3], x.shape[-2]
    if (h, w) == (out_h, out_w):
        return x
    ah = jax.image.resize(jnp.eye(h, dtype=x.dtype), (out_h, h),
                          method="linear")
    aw = jax.image.resize(jnp.eye(w, dtype=x.dtype), (out_w, w),
                          method="linear")
    y = jnp.einsum("oh,...hwc->...owc", ah, x)
    return jnp.einsum("pw,...owc->...opc", aw, y)


def _nearest_resize_voxel(x, factor):
    """Integer-factor nearest downsample of (..., X, Y, Z)."""
    return strided_downsample(x, (factor, factor, factor))


def _pyramid(batch, key_in, key_out, mode="nearest"):
    """Write {key_out}_1/2/4 downsampled label pyramids."""
    batch[f"{key_out}_1"] = batch[key_in]
    h, w = batch[key_in].shape[-3], batch[key_in].shape[-2]
    for k in (2, 4):
        prev = batch[f"{key_out}_{k // 2}"]
        if mode == "nearest":
            batch[f"{key_out}_{k}"] = _nearest_resize(prev, h // k, w // k)
        else:
            batch[f"{key_out}_{k}"] = _bilinear_resize(prev, h // k, w // k)
    return batch


class PreProcess:
    def __init__(self, cfg):
        self.cfg = cfg
        self.crop = tuple(cfg.IMAGE.CROP)
        self.route_map_size = cfg.ROUTE.SIZE
        self.center_sigma = cfg.INSTANCE_SEG.CENTER_LABEL_SIGMA_PX
        self.ignore_index = cfg.INSTANCE_SEG.IGNORE_INDEX
        self.min_depth = cfg.BEV.FRUSTUM_POOL.D_BOUND[0]
        self.max_depth = cfg.BEV.FRUSTUM_POOL.D_BOUND[1]
        self.image_mean = jnp.asarray(cfg.IMAGE.IMAGENET_MEAN)
        self.image_std = jnp.asarray(cfg.IMAGE.IMAGENET_STD)
        if cfg.EVAL.MASK_VIEW:
            from muvo_tpu.geometry.camera import get_out_of_view_mask

            self.bev_out_of_view_mask = jnp.asarray(get_out_of_view_mask(cfg))
        else:
            self.bev_out_of_view_mask = None

    # ------------------------------------------------------------------
    def __call__(self, batch: Dict, training: bool = False,
                 rng: jax.Array | None = None) -> Dict:
        batch = dict(batch)
        batch["image"] = batch["image"].astype(jnp.float32) / 255.0

        if "route_map" in batch:
            rm = batch["route_map"].astype(jnp.float32) / 255.0
            batch["route_map"] = _nearest_resize(
                rm, self.route_map_size, self.route_map_size
            )

        batch = self._crop(batch)
        if self.cfg.EVAL.RESOLUTION.ENABLED:
            batch = self._rescale(batch, 1.0 / self.cfg.EVAL.RESOLUTION.FACTOR)

        batch = self.prepare_labels(batch)

        if training and rng is not None:
            batch = self.augmentation(batch, rng)

        batch["image"] = (batch["image"] - self.image_mean) / self.image_std
        if "route_map" in batch:
            batch["route_map"] = (batch["route_map"] - self.image_mean) / self.image_std

        if "depth" in batch:
            batch["depth_mask"] = (batch["depth"] > self.min_depth) & (
                batch["depth"] < self.max_depth
            )
        return batch

    # ------------------------------------------------------------------
    def _crop(self, batch):
        left, top, right, bottom = self.crop
        for key in ("image", "depth", "depth_color", "semantic_image",
                    "image_instance_mask"):
            if key in batch:
                batch[key] = batch[key][..., top:bottom, left:right, :]
        if "intrinsics" in batch:
            K = batch["intrinsics"]
            K = K.at[..., 0, 2].add(-left)
            K = K.at[..., 1, 2].add(-top)
            batch["intrinsics"] = K
        return batch

    def _rescale(self, batch, scale):
        h, w = batch["image"].shape[-3], batch["image"].shape[-2]
        h1, w1 = int(round(h * scale)), int(round(w * scale))
        for key in ("image", "image_instance_mask", "semantic_image"):
            if key in batch:
                batch[key] = _bilinear_resize(batch[key], h1, w1)
        if "intrinsics" in batch:
            K = batch["intrinsics"]
            batch["intrinsics"] = K.at[..., :2, :].multiply(scale)
        return batch

    # ------------------------------------------------------------------
    def prepare_labels(self, batch):
        cfg = self.cfg

        if "birdview_label" in batch:
            bv = batch["birdview_label"]
            if self.bev_out_of_view_mask is not None:
                bv = jnp.where(self.bev_out_of_view_mask[..., None], 0, bv)
            # frustum pooling produces BEV rotated 90deg clockwise
            bv = jnp.rot90(bv, k=-1, axes=(-3, -2))
            batch["birdview_label"] = bv
            batch = _pyramid(batch, "birdview_label", "birdview_label")

        if "instance_label" in batch:
            inst = batch["instance_label"]
            if self.bev_out_of_view_mask is not None:
                inst = jnp.where(self.bev_out_of_view_mask[..., None], 0, inst)
            inst = jnp.rot90(inst, k=-1, axes=(-3, -2))
            batch["instance_label"] = inst
            batch = _pyramid(batch, "instance_label", "instance_label")
            for k in (1, 2, 4):
                center, offset = center_offset_labels(
                    batch[f"instance_label_{k}"][..., 0],
                    sigma=self.center_sigma / k,
                    ignore_index=self.ignore_index,
                )
                batch[f"center_label_{k}"] = center
                batch[f"offset_label_{k}"] = offset
            batch["center_label"] = batch["center_label_1"]
            batch["offset_label"] = batch["offset_label_1"]

        if cfg.EVAL.RGB_SUPERVISION:
            batch["rgb_label_1"] = batch["image"]
            h, w = batch["image"].shape[-3], batch["image"].shape[-2]
            for k in (2, 4):
                batch[f"rgb_label_{k}"] = _bilinear_resize(
                    batch[f"rgb_label_{k // 2}"], h // k, w // k
                )
            if cfg.LOSSES.RGB_INSTANCE and "image_instance_mask" in batch:
                batch = _pyramid(batch, "image_instance_mask", "image_instance_mask")

        if cfg.SEMANTIC_IMAGE.ENABLED and "semantic_image" in batch:
            batch = _pyramid(batch, "semantic_image", "semantic_image_label")

        if cfg.DEPTH.ENABLED and "depth" in batch:
            batch["depth_label_1"] = batch["depth"]
            h, w = batch["depth"].shape[-3], batch["depth"].shape[-2]
            for k in (2, 4):
                batch[f"depth_label_{k}"] = _bilinear_resize(
                    batch[f"depth_label_{k // 2}"], h // k, w // k
                )

        if (cfg.POINTS.DEVICE_PROJECTION
                and "range_view_pcd_xyzd" not in batch
                and "points_raw" in batch):
            batch = self._device_range_projection(batch)

        if cfg.LIDAR_RE.ENABLED and "range_view_pcd_xyzd" in batch:
            rv = batch["range_view_pcd_xyzd"].astype(jnp.float32) / cfg.LIDAR_RE.SCALE
            batch["range_view_pcd_xyzd"] = rv
            batch = _pyramid(batch, "range_view_pcd_xyzd", "range_view_label")

        if cfg.LIDAR_SEG.ENABLED and "range_view_pcd_seg" in batch:
            batch = _pyramid(batch, "range_view_pcd_seg", "range_view_seg_label")

        if cfg.VOXEL_SEG.ENABLED and "voxel" in batch:
            batch["voxel_label_1"] = batch["voxel"]
            for k in (2, 4):
                batch[f"voxel_label_{k}"] = _nearest_resize_voxel(
                    batch[f"voxel_label_{k // 2}"], 2
                )
        return batch

    # ------------------------------------------------------------------
    def _device_range_projection(self, batch):
        """Fused on-device range-view construction from raw padded points.

        Replaces the host-side projection in the dataloader (BASELINE north
        star: the range projection becomes a fused XLA op feeding
        device-resident batches). Requires points_raw (b, s, P, 3),
        num_points (b, s) and — for LIDAR_SEG — points_sem (b, s, P).
        """
        from muvo_tpu.geometry.range_view import RangeProjector

        cfg = self.cfg
        proj = RangeProjector(
            cfg.POINTS.CHANNELS, cfg.POINTS.HORIZON_RESOLUTION,
            cfg.POINTS.FOV[0], cfg.POINTS.FOV[1], cfg.POINTS.LIDAR_POSITION,
        )
        pts = batch["points_raw"]
        b, s, p, _ = pts.shape
        num = batch["num_points"].reshape(b * s)
        sems = batch.get("points_sem")
        sems = (sems.reshape(b * s, p) if sems is not None
                else jnp.zeros((b * s, p), jnp.int32))
        valid = jnp.arange(p)[None, :] < num[:, None]

        def one(points, sem, val):
            return proj.project_jax(points, sem, valid=val)

        depth, xyz, sem = jax.vmap(one)(
            pts.reshape(b * s, p, 3), sems, valid
        )
        h, w = proj.h, proj.w
        batch["range_view_pcd_xyzd"] = jnp.concatenate(
            [xyz, depth[..., None]], axis=-1
        ).reshape(b, s, h, w, 4)
        if cfg.LIDAR_SEG.ENABLED:
            batch["range_view_pcd_seg"] = sem.reshape(b, s, h, w)[..., None]
        return batch

    # ------------------------------------------------------------------
    def augmentation(self, batch, rng):
        rng_pixel, rng_route = jax.random.split(rng)
        batch = self._pixel_augmentation(batch, rng_pixel)
        batch = self._route_augmentation(batch, rng_route)
        return batch

    def _pixel_augmentation(self, batch, rng):
        aug = self.cfg.IMAGE.AUGMENTATION
        image = batch["image"]  # (b, s, h, w, 3), [0,1]
        b, s = image.shape[:2]
        flat = image.reshape((b * s,) + image.shape[2:])
        keys = jax.random.split(rng, b * s)

        def per_frame(img, key):
            k_sel, k_blur, k_sharp, k_jit = jax.random.split(key, 4)
            u = jax.random.uniform(k_sel)
            std = jax.random.uniform(
                k_blur, minval=aug.BLUR_STD[0], maxval=aug.BLUR_STD[1]
            )
            blurred = _gaussian_blur(img, aug.BLUR_WINDOW, std)
            factor = jax.random.uniform(
                k_sharp, minval=aug.SHARPEN_FACTOR[0], maxval=aug.SHARPEN_FACTOR[1]
            )
            sharpened = _adjust_sharpness(img, factor)
            img = jnp.where(
                u < aug.BLUR_PROB,
                blurred,
                jnp.where(u < aug.BLUR_PROB + aug.SHARPEN_PROB, sharpened, img),
            )
            return _color_jitter(
                img, k_jit, aug.COLOR_PROB, aug.COLOR_JITTER_BRIGHTNESS,
                aug.COLOR_JITTER_CONTRAST, aug.COLOR_JITTER_SATURATION,
                aug.COLOR_JITTER_HUE,
            )

        flat = jax.vmap(per_frame)(flat, keys)
        batch["image"] = flat.reshape(image.shape)
        return batch

    def _route_augmentation(self, batch, rng):
        if "route_map" not in batch:
            return batch
        cfg = self.cfg.ROUTE
        rm = batch["route_map"]  # (b, s, h, w, 3)
        b = rm.shape[0]
        keys = jax.random.split(rng, b)

        def per_sample(maps, key):  # maps: (s, h, w, 3)
            k_sel, k_h, k_small, k_large = jax.random.split(key, 4)
            u = jax.random.uniform(k_sel)
            h = maps.shape[1]
            # end-of-route: zero the top `height` rows
            height = jax.random.randint(k_h, (), 0, h)
            rows = jnp.arange(h)[None, :, None, None]
            end_of_route = jnp.where(rows < height, 0.0, maps)
            small = _random_affine(maps, k_small, cfg.AUGMENTATION_DEGREES,
                                   cfg.AUGMENTATION_TRANSLATE,
                                   cfg.AUGMENTATION_SCALE, cfg.AUGMENTATION_SHEAR)
            large = _random_affine(maps, k_large, 180.0,
                                   cfg.AUGMENTATION_TRANSLATE,
                                   cfg.AUGMENTATION_SCALE, cfg.AUGMENTATION_SHEAR)
            p0 = cfg.AUGMENTATION_DROPOUT
            p1 = p0 + cfg.AUGMENTATION_END_OF_ROUTE
            p2 = p1 + cfg.AUGMENTATION_SMALL_ROTATION
            p3 = p2 + cfg.AUGMENTATION_LARGE_ROTATION
            out = jnp.where(
                u < p0, jnp.zeros_like(maps),
                jnp.where(u < p1, end_of_route,
                          jnp.where(u < p2, small,
                                    jnp.where(u < p3, large, maps))))
            return out

        batch["route_map"] = jax.vmap(per_sample)(rm, keys)
        return batch


# ---------------------------------------------------------------------------
# image ops
# ---------------------------------------------------------------------------
def _gaussian_blur(img, window, std):
    """Separable gaussian blur, reflect padding. img: (h, w, 3)."""
    half = window // 2
    x = jnp.arange(window, dtype=jnp.float32) - half
    kern = jnp.exp(-(x ** 2) / (2 * std ** 2))
    kern = kern / kern.sum()

    img = _conv1d(jnp.pad(img, ((half, half), (0, 0), (0, 0)), "reflect"), kern, 0)
    img = _conv1d(jnp.pad(img, ((0, 0), (half, half), (0, 0)), "reflect"), kern, 1)
    return img


def _conv1d(im, kern, axis):
    """Valid-mode 1-D convolution along `axis` of (h, w, c) via shifted
    slices (gather-free; fuses into one elementwise pipeline on TPU)."""
    window = kern.shape[0]
    out_len = im.shape[axis] - window + 1
    acc = None
    for t in range(window):
        sl = [slice(None)] * im.ndim
        sl[axis] = slice(t, t + out_len)
        term = im[tuple(sl)] * kern[t]
        acc = term if acc is None else acc + term
    return acc


def _adjust_sharpness(img, factor):
    """torchvision adjust_sharpness: blend with a fixed 3x3 smoothing."""
    kern = jnp.array([[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]]) / 13.0
    padded = jnp.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")
    windows = (
        padded[0:-2, 0:-2] * kern[0, 0] + padded[0:-2, 1:-1] * kern[0, 1]
        + padded[0:-2, 2:] * kern[0, 2] + padded[1:-1, 0:-2] * kern[1, 0]
        + padded[1:-1, 1:-1] * kern[1, 1] + padded[1:-1, 2:] * kern[1, 2]
        + padded[2:, 0:-2] * kern[2, 0] + padded[2:, 1:-1] * kern[2, 1]
        + padded[2:, 2:] * kern[2, 2]
    )
    # torchvision keeps the border rows/cols of the original
    h, w = img.shape[:2]
    border = (jnp.arange(h)[:, None] == 0) | (jnp.arange(h)[:, None] == h - 1)
    border = border | (jnp.arange(w)[None, :] == 0) | (jnp.arange(w)[None, :] == w - 1)
    smoothed = jnp.where(border[..., None], img, windows)
    return jnp.clip(img + (factor - 1.0) * (img - smoothed), 0.0, 1.0)


def _rgb_to_grayscale(img):
    w = jnp.array([0.299, 0.587, 0.114])
    return (img * w).sum(axis=-1, keepdims=True)


def _color_jitter(img, key, prob, brightness, contrast, saturation, hue):
    k_apply, kb, kc, ks, kh = jax.random.split(key, 5)
    fb = jax.random.uniform(kb, minval=max(0, 1 - brightness), maxval=1 + brightness)
    fc = jax.random.uniform(kc, minval=max(0, 1 - contrast), maxval=1 + contrast)
    fs = jax.random.uniform(ks, minval=max(0, 1 - saturation), maxval=1 + saturation)
    fh = jax.random.uniform(kh, minval=-hue, maxval=hue)

    out = jnp.clip(img * fb, 0, 1)
    gray_mean = _rgb_to_grayscale(out).mean()
    out = jnp.clip(gray_mean + fc * (out - gray_mean), 0, 1)
    gray = _rgb_to_grayscale(out)
    out = jnp.clip(gray + fs * (out - gray), 0, 1)
    out = _adjust_hue(out, fh)

    return jnp.where(jax.random.uniform(k_apply) < prob, out, img)


def _adjust_hue(img, hue_factor):
    """Rotate hue by hue_factor (fraction of a full turn), via YIQ rotation."""
    yiq = jnp.array([
        [0.299, 0.587, 0.114],
        [0.5959, -0.2746, -0.3213],
        [0.2115, -0.5227, 0.3112],
    ])
    rgb_from_yiq = jnp.linalg.inv(yiq)
    theta = 2 * jnp.pi * hue_factor
    c, s = jnp.cos(theta), jnp.sin(theta)
    rot = jnp.array([[1, 0, 0], [0, c, -s], [0, s, c]])
    m = rgb_from_yiq @ rot @ yiq
    return jnp.clip(jnp.einsum("hwc,dc->hwd", img, m), 0, 1)


def _random_affine(maps, key, degrees, translate, scale_range, shear):
    """Random rotation/translation/scale/shear of (s, h, w, c) maps."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    h, w = maps.shape[1:3]
    angle = jax.random.uniform(k1, minval=-degrees, maxval=degrees) * jnp.pi / 180
    tx = jax.random.uniform(k2, minval=-translate[0], maxval=translate[0]) * w
    ty = jax.random.uniform(k3, minval=-translate[1], maxval=translate[1]) * h
    sc = jax.random.uniform(k4, minval=scale_range[0], maxval=scale_range[1])
    shx = jax.random.uniform(k5, minval=-shear[0], maxval=shear[0]) * jnp.pi / 180

    cos, sin = jnp.cos(angle), jnp.sin(angle)
    # inverse transform mapping output pixel -> input pixel
    a = cos / sc
    b = (sin + shx * cos) / sc
    cx, cy = w / 2.0, h / 2.0

    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    x0 = xs - cx - tx
    y0 = ys - cy - ty
    src_x = a * x0 + b * y0 + cx
    src_y = -sin / sc * x0 + cos / sc * y0 + cy

    def sample(chan):  # (h, w)
        return jax.scipy.ndimage.map_coordinates(
            chan, [src_y, src_x], order=1, mode="constant", cval=0.0
        )

    return jax.vmap(jax.vmap(sample, in_axes=-1, out_axes=-1), in_axes=0)(maps)
