"""Full-graph weight conversion: a complete reference-shaped state_dict must
cover EVERY parameter and batch-stat leaf of the model, be fully consumed,
and the merged parameters must run the full jitted forward.

The torch key names and shapes are derived from the converter itself: every
array op it performs (_conv/_deconv/.T/moveaxis) is a pure axis permutation,
so a tracer run records, per converted leaf, which torch key produced it and
with which permutation — inverting that against the model's real parameter
template yields the exact reference state_dict layout
(reference load contract: muvo/trainer.py:202-211, muvo/models/mile.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from muvo_tpu.config import as_static
from muvo_tpu.data.synthetic import synthetic_batch, tiny_test_cfg
from muvo_tpu.models.preprocess import PreProcess
from muvo_tpu.models.world_model import MuvoWorldModel
from muvo_tpu.training.weight_convert import (
    _merge_into,
    convert_reference_state_dict,
)


class _Tracer:
    """Stands in for a torch tensor during a converter dry-run; records the
    source key and the axis permutation applied to it."""

    ndim = 4  # converter branches on rank; 4-d perms are extended to 5-d
    # against the real template leaf in _torch_shape below

    def __init__(self, key, perm=None):
        self.key = key
        self.perm = perm  # None = identity / unknown rank

    @property
    def T(self):  # only used on 2-D linear weights
        return _Tracer(self.key, (1, 0))

    def __getitem__(self, idx):  # flips preserve shape
        return self

    def copy(self):
        return self

    def __array_function__(self, func, types, args, kwargs):
        if func is np.transpose:
            axes = args[1] if len(args) > 1 else kwargs.get("axes")
            return _Tracer(self.key, tuple(axes))
        if func is np.moveaxis:  # only used as moveaxis(x, 0, -1)
            return _Tracer(self.key, "moveaxis_0_last")
        raise NotImplementedError(f"converter used unexpected op {func}")


class _SpyState(dict):
    """Pretends to contain every torch key (minus an exclusion filter);
    hands out tracers."""

    def __init__(self, keep=None):
        super().__init__()
        self._keep = keep or (lambda k: True)

    def __contains__(self, key):
        return self._keep(key)

    def __getitem__(self, key):
        assert self._keep(key)
        return _Tracer(key)


class _RecordingState(dict):
    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.read = set()

    def __getitem__(self, key):
        self.read.add(key)
        return super().__getitem__(key)

    def __contains__(self, key):
        return super().__contains__(key)


def _full_cfg():
    # Flagship transformer path with every decoder head switched on, so the
    # conversion of each module family is exercised.
    cfg = tiny_test_cfg()
    cfg.PRECISION = "32"
    cfg.MODEL.TRANSFORMER.N_LAYERS = 2
    cfg.MODEL.TRANSFORMER.DIM_FEEDFORWARD = 64
    cfg.MODEL.DECODER_BASE_CHANNELS = 32
    cfg.SEMANTIC_SEG.ENABLED = True
    cfg.SEMANTIC_SEG.N_CHANNELS = 3
    cfg.LIDAR_SEG.ENABLED = True
    cfg.LIDAR_SEG.N_CLASSES = 4
    cfg.SEMANTIC_IMAGE.ENABLED = True
    cfg.SEMANTIC_IMAGE.N_CLASSES = 4
    cfg.DEPTH.ENABLED = True
    return cfg


def _torch_shape(template_shape, perm):
    if perm is None:
        return tuple(template_shape)
    if perm == "moveaxis_0_last":
        n = len(template_shape)
        perm = tuple(range(1, n)) + (0,)
    if len(perm) == 4 and len(template_shape) == 5:
        # the tracer claims ndim=4; extend the converter's 4-d layouts to
        # their 5-d equivalents (weight_convert._conv/_deconv)
        perm = {(2, 3, 1, 0): (2, 3, 4, 1, 0),
                (2, 3, 0, 1): (2, 3, 4, 0, 1)}[tuple(perm)]
    out = [None] * len(perm)
    for i, p in enumerate(perm):
        out[p] = template_shape[i]
    return tuple(out)


def _walk(tree, path=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _walk(v, path + (k,))
        else:
            yield path + (k,), v


def _lookup(tree, path):
    node = tree
    for p in path:
        if not isinstance(node, dict) or p not in node:
            return None
        node = node[p]
    return node


@pytest.mark.slow
def test_full_state_dict_roundtrip_and_forward():
    cfg = _full_cfg()
    batch = synthetic_batch(cfg, 1, 2)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    pre = PreProcess(cfg)
    pb = jax.jit(lambda b: pre(b, training=False))(batch)
    model = MuvoWorldModel(as_static(cfg))
    variables = jax.jit(model.init, static_argnames=("training",))(
        {"params": jax.random.PRNGKey(0)}, pb, training=False,
        rng=jax.random.PRNGKey(1),
    )
    params_t = jax.device_get(variables["params"])
    stats_t = jax.device_get(variables.get("batch_stats", {}))

    # The flagship checkpoint has the range-view LiDAR encoder, not the
    # PointPillars one (they share a destination in this model) — exclude
    # the latter during the dry-run or it overwrites the range-view leaves.
    def keep(key):
        return not key.startswith("point_pillar_")

    # Pass 1: converter dry-run records torch-key -> (leaf path, permutation)
    traced_params, traced_stats = convert_reference_state_dict(
        _SpyState(keep), cfg)

    rng = np.random.RandomState(0)
    state = {}
    for traced, template in ((traced_params, params_t),
                             (traced_stats, stats_t)):
        for path, leaf in _walk(traced):
            target = _lookup(template, path)
            if target is None or not isinstance(leaf, _Tracer):
                continue
            if not keep(leaf.key):
                continue
            shape = _torch_shape(np.shape(target), leaf.perm)
            value = rng.randn(*shape).astype(np.float32) * 0.02
            if path[-1] == "var":  # BN running_var must stay positive
                value = np.abs(value) + 0.5
            state[leaf.key] = value

    # Pass 2: real conversion must consume every key and fill every leaf.
    recording = _RecordingState(state)
    converted, conv_stats = convert_reference_state_dict(recording, cfg)
    unread = set(state) - recording.read
    assert not unread, f"{len(unread)} state_dict keys never consumed: " \
                       f"{sorted(unread)[:10]}"

    merged, missing = _merge_into(params_t, converted)
    assert not missing, f"{len(missing)} param leaves unfilled: {missing[:10]}"
    merged_stats, missing_stats = _merge_into(stats_t, conv_stats)
    assert not missing_stats, (
        f"{len(missing_stats)} batch_stat leaves unfilled: {missing_stats[:10]}"
    )

    # The converted tree must also run: full jitted forward, finite outputs.
    out, _ = jax.jit(
        lambda v, b: model.apply(v, b, training=False,
                                 rng=jax.random.PRNGKey(2))
    )({"params": merged, "batch_stats": merged_stats}, pb)
    assert np.isfinite(float(jnp.sum(out["throttle_brake"])))
    for key in ("rgb_1", "lidar_reconstruction_1", "lidar_segmentation_1",
                "semantic_image_1", "depth_1", "bev_segmentation_1",
                "voxel_1"):
        assert key in out, f"forward output missing {key}"
        assert bool(jnp.all(jnp.isfinite(out[key]))), f"{key} not finite"
