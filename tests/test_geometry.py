import numpy as np
import jax.numpy as jnp
import pytest

from muvo_tpu.config import get_cfg
from muvo_tpu.geometry.camera import (
    bev_params_to_intrinsics,
    calculate_geometry,
    get_out_of_view_mask,
    intrinsics_inverse,
)
from muvo_tpu.geometry.range_view import RangeProjector
from muvo_tpu.geometry.voxel import (
    decode_depth,
    depth_to_pcd,
    convert_coor_img,
    convert_coor_lidar,
    voxel_filter,
    densify_voxels,
)
from muvo_tpu.data.dataset_utils import (
    binary_to_integer,
    integer_to_binary,
    calculate_birdview_labels,
    preprocess_birdview_and_routemap,
)

rng = np.random.RandomState(0)


def test_intrinsics_values():
    K, E = calculate_geometry(100, 600, 960, 1.0, 0.0, 2.0, 0.0, 0.0, 0.0)
    f = 960 / (2 * np.tan(100 * np.pi / 360))
    assert np.isclose(K[0, 0], f)
    assert K[0, 2] == 480 and K[1, 2] == 300
    # extrinsics maps camera (right, down, forward) to ego (forward, left, up)
    cam_pt = np.array([0.0, 0.0, 1.0, 1.0])  # 1m forward of camera
    ego = E @ cam_pt
    np.testing.assert_allclose(ego[:3], [2.0, 0.0, 2.0])


def test_intrinsics_inverse_matches_linalg():
    K = np.array([[[120.0, 0, 50], [0, 80.0, 40], [0, 0, 1]]] * 3)
    inv = np.asarray(intrinsics_inverse(jnp.asarray(K)))
    np.testing.assert_allclose(inv, np.linalg.inv(K), rtol=1e-5, atol=1e-5)


def test_bev_intrinsics_roundtrip():
    K = bev_params_to_intrinsics((48, 48), 0.8, -16.0)
    # ego-forward 10m, left 2m
    px = K @ np.array([10.0, 2.0, 1.0])
    assert np.isclose(px[0], 10.0 / 0.8 + 48 / 2 - 16)
    assert np.isclose(px[1], -2.0 / 0.8 + 48 / 2)


def test_out_of_view_mask_shape_and_behind_ego():
    cfg = get_cfg()
    mask = get_out_of_view_mask(cfg)
    assert mask.shape == (192, 192)
    # everything behind the camera is masked
    assert mask[-5:].all()
    # straight ahead near the top of bev is visible
    assert not mask[5, 96]


def brute_force_range_projection(points, semantics, proj: RangeProjector):
    """Literal per-point reimplementation of the reference z-buffer."""
    pc = points * np.array([1.0, -1.0, 1.0]) - proj.lidar_position
    depth = np.linalg.norm(pc, axis=1)
    yaw = np.arctan2(-pc[:, 1], pc[:, 0])
    pitch = np.arcsin(pc[:, 2] / depth)
    pw = np.clip(np.floor(0.5 * (1 - yaw / np.pi) * proj.w), 0, proj.w - 1).astype(int)
    ph = np.clip(
        np.floor((1 - (pitch + abs(proj.fov_down)) / proj.fov) * proj.h), 0, proj.h - 1
    ).astype(int)
    rd = np.full((proj.h, proj.w), -1, np.float32)
    rs = np.zeros((proj.h, proj.w), np.uint8)
    rx = np.zeros((proj.h, proj.w, 3), np.float32)
    for i in np.argsort(depth)[::-1]:
        rd[ph[i], pw[i]] = depth[i]
        rs[ph[i], pw[i]] = semantics[i]
        rx[ph[i], pw[i]] = points[i]
    return rd, rx, rs


def test_range_projection_matches_brute_force():
    proj = RangeProjector(h=16, w=64)
    pts = rng.uniform(-40, 40, size=(500, 3))
    pts[:, 2] = rng.uniform(0, 6, size=500)
    sem = rng.randint(0, 9, size=500).astype(np.uint8)
    rd, rx, rs = proj.project(pts, sem)
    brd, brx, brs = brute_force_range_projection(pts, sem, proj)
    np.testing.assert_allclose(rd, brd, rtol=1e-6)
    np.testing.assert_allclose(rx, brx, rtol=1e-6)
    np.testing.assert_array_equal(rs, brs)


def test_range_projection_jax_matches_numpy():
    proj = RangeProjector(h=16, w=64)
    pts = rng.uniform(-30, 30, size=(300, 3))
    pts[:, 2] = rng.uniform(0.5, 5, size=300)
    sem = rng.randint(0, 9, size=300).astype(np.int32)
    rd_np, rx_np, rs_np = proj.project(pts, sem)
    rd_j, rx_j, rs_j = proj.project_jax(
        jnp.asarray(pts, jnp.float32), jnp.asarray(sem)
    )
    # fp32 vs fp64 depth norms: tolerate tiny differences
    np.testing.assert_allclose(np.asarray(rd_j), rd_np, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(rx_j), rx_np, rtol=1e-4, atol=1e-4)
    mismatch = (np.asarray(rs_j) != rs_np).mean()
    assert mismatch < 0.01  # ties may resolve differently


def test_range_projection_inverse_roundtrip():
    proj = RangeProjector(h=64, w=256)
    pts = rng.uniform(-30, 30, size=(2000, 3))
    pts[:, 2] = rng.uniform(0.5, 5, size=2000)
    sem = np.zeros(2000, np.uint8)
    rd, rx, _ = proj.project(pts, sem)
    restored = proj.restore(rd[None, None])[0, 0]  # (H, W, 4)
    valid = rd > 0
    # restored xyz should approximately match the projected xyz of the winner
    err = np.abs(restored[..., :3][valid] - rx[valid])
    # pixel quantisation bounds the error: angular bin ~ (2*pi/256)*range
    assert np.median(err) < 1.0


def test_depth_decode_and_backprojection():
    # depth 10m encoded in CARLA RGB format
    d = 10.0
    norm = d / 1000.0 * (256 ** 3 - 1)
    r = int(norm) % 256
    g = (int(norm) // 256) % 256
    b = (int(norm) // 256 ** 2) % 256
    img = np.zeros((4, 4, 3), np.uint8)
    img[...] = (r, g, b)
    depth = decode_depth(img)
    np.testing.assert_allclose(depth, d, atol=1e-2)

    sem = np.ones((4, 4), np.uint8)
    pts, s = depth_to_pcd(depth, sem, fov=90)
    assert pts.shape[0] == 16
    np.testing.assert_allclose(pts[:, 2], d, atol=1e-2)
    # centre pixel ray passes close to the optical axis
    f = 4 / (2 * np.tan(np.pi / 4))
    assert np.allclose(pts[:, 0].mean(), (np.arange(4).mean() - 2) * d / f, atol=0.1)


def test_coordinate_conversions():
    pts = np.array([[0.0, 0.0, 5.0]])  # 5m forward in camera frame
    ego = convert_coor_img(pts, (1.0, 0.0, 2.0))
    np.testing.assert_allclose(ego, [[6.0, 0.0, 2.0]])

    lidar_pts = np.array([[1.0, 2.0, 3.0]])
    ego_l = convert_coor_lidar(lidar_pts.copy(), (1.0, 0.0, 2.0))
    np.testing.assert_allclose(ego_l, [[2.0, -2.0, 5.0]])


def brute_force_voxel_filter(pcd, sem, res, size, offset, road_idx=6):
    size = np.asarray(size)
    offset = np.asarray(offset, float) + res * size / 2
    pcd_b = pcd + offset
    idx = ((0 <= pcd_b) & (pcd_b < size * res)).all(axis=1)
    pcd_b, sem_b = pcd_b[idx], sem[idx]
    dx, dy, _ = size
    hxyz, hmod = np.divmod(pcd_b, res)
    h = hxyz[:, 0] + hxyz[:, 1] * dx + hxyz[:, 2] * dx * dy
    order = np.argsort(h, kind="stable")
    h, hxyz, sem_b, hmod = h[order], hxyz[order], sem_b[order], hmod[order]
    h_n, indices = np.unique(h, return_index=True)
    voxels, labels = [], []
    for i in range(len(h_n)):
        sl = slice(indices[i], indices[i + 1] if i < len(h_n) - 1 else len(h))
        dis = np.sum(hmod[sl] ** 2, axis=1)
        s = sem_b[sl]
        lab = road_idx if np.isin(s, road_idx).any() else s[np.argmin(dis)]
        voxels.append(hxyz[sl][0])
        labels.append(lab)
    return np.array(voxels, np.uint16), np.array(labels, np.uint8)


def test_voxel_filter_matches_brute_force():
    pts = rng.uniform(-10, 10, size=(2000, 3))
    sem = rng.randint(0, 23, size=2000).astype(np.uint8)
    res, size, offset = 0.5, [24, 24, 16], [0.0, 0.0, -2.0]
    v1, s1 = voxel_filter(pts, sem, res, size, offset)
    v2, s2 = brute_force_voxel_filter(pts, sem, res, size, offset)
    np.testing.assert_array_equal(v1, v2)
    # labels agree except possibly at exact distance ties
    assert (s1 != s2).mean() < 0.01


def test_voxel_filter_roadlines_priority():
    pts = np.array([[0.1, 0.1, 0.1], [0.11, 0.11, 0.11]])
    sem = np.array([7, 6], np.uint8)  # road, roadlines in the same cell
    v, s = voxel_filter(pts, sem, 1.0, [4, 4, 4], [-2.0, -2.0, -2.0])
    assert len(s) == 1 and s[0] == 6


def test_voxel_filter_empty():
    v, s = voxel_filter(np.zeros((0, 3)), np.zeros((0,)), 0.2, [4, 4, 4], [0, 0, 0])
    assert v.shape == (0, 3) and s.shape == (0,)


def test_densify_voxels():
    coords = np.array([[0, 0, 0], [2, 3, 1]], np.uint16)
    sem = np.array([1, 5], np.uint8)
    grid = densify_voxels(coords, sem, (4, 4, 4))
    assert grid[0, 0, 0] == 1 and grid[2, 3, 1] == 5 and grid.sum() == 6


def test_birdview_bit_packing_roundtrip():
    n_bits = 8
    masks = (rng.rand(50, n_bits) > 0.5).astype(np.float32)
    ints = binary_to_integer(masks, n_bits)
    back = integer_to_binary(ints, n_bits)
    np.testing.assert_array_equal(masks, back)


def test_birdview_labels_priority():
    # pixel with road (1) and red light (7): red light wins.
    # Background channel 0 is always set (preprocess_birdview_and_routemap),
    # so pure-background pixels decode to 0.
    bv = np.zeros((8, 2, 2), np.float32)
    bv[0] = 1  # background everywhere
    bv[1, 0, 0] = 1
    bv[7, 0, 0] = 1
    bv[1, 1, 1] = 1
    labels = calculate_birdview_labels(bv, 8)
    assert labels[0, 0] == 7
    assert labels[1, 1] == 1
    assert labels[0, 1] == 0


def test_preprocess_birdview_and_routemap():
    bv = np.zeros((12, 4, 4), np.uint8)
    bv[0, 0, 0] = 255   # road
    bv[1, 1, 1] = 3     # route map source channel
    bv[-1, 2, 2] = 80   # green light
    bv[-1, 3, 3] = 255  # red light
    processed, route = preprocess_birdview_and_routemap(bv)
    assert processed.shape == (8, 4, 4)
    assert processed[1, 0, 0] == 1          # road
    assert processed[5, 2, 2] == 1          # green light
    assert processed[7, 3, 3] == 1          # red light
    assert processed[0, 1, 1] == 1          # background elsewhere
    assert route[1, 1] == 255 and route[0, 0] == 0
