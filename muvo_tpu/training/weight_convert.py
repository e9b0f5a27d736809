"""Reference (PyTorch Lightning) checkpoint -> muvo_tpu parameter conversion.

Maps the reference module names (muvo/models/mile.py) onto this framework's
parameter tree so released weights can be parity-evaluated. Handles layout
conversion: conv OIHW->HWIO, deconv IOHW->flipped HWIO, linear transpose,
BN running stats into the batch_stats collection, and the NCHW->NDHWC
constant tensors of the StyleGAN decoders.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _conv(w):
    return np.transpose(w, (2, 3, 1, 0)) if w.ndim == 4 else np.transpose(
        w, (2, 3, 4, 1, 0)
    )


def _deconv(w):
    if w.ndim == 4:
        return np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1)).copy()
    return np.transpose(w[:, :, :, ::-1, ::-1], (2, 3, 4, 0, 1)).copy()


def _set(tree: Dict, path: Tuple[str, ...], value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _resnet_entries(src_prefix: str, dst_prefix: Tuple[str, ...], state, params,
                    stats):
    """Map a timm resnet18 features_only trunk."""
    def conv(src, dst):
        if src in state:
            _set(params, dst + ("kernel",), _conv(state[src]))

    def bn(src, dst):
        if f"{src}.weight" not in state:
            return
        _set(params, dst + ("scale",), state[f"{src}.weight"])
        _set(params, dst + ("bias",), state[f"{src}.bias"])
        _set(stats, dst + ("mean",), state[f"{src}.running_mean"])
        _set(stats, dst + ("var",), state[f"{src}.running_var"])

    conv(f"{src_prefix}.conv1.weight", dst_prefix + ("conv1",))
    bn(f"{src_prefix}.bn1", dst_prefix + ("bn1",))
    for stage in range(1, 5):
        for block in range(4):  # resnet18/34
            sp = f"{src_prefix}.layer{stage}.{block}"
            if f"{sp}.conv1.weight" not in state:
                continue
            dp = dst_prefix + (f"layer{stage}_{block}",)
            conv(f"{sp}.conv1.weight", dp + ("conv1",))
            bn(f"{sp}.bn1", dp + ("bn1",))
            conv(f"{sp}.conv2.weight", dp + ("conv2",))
            bn(f"{sp}.bn2", dp + ("bn2",))
            conv(f"{sp}.downsample.0.weight", dp + ("downsample_conv",))
            bn(f"{sp}.downsample.1", dp + ("downsample_bn",))


def _mobilevit_entries(src_prefix: str, dst_prefix: Tuple[str, ...], state,
                       params, stats):
    """Map a timm mobilevitv2_100 features_only trunk (byobnet naming:
    stem.conv/bn, stages.{i}.{j}.…) onto models/backbones/mobilevit.py's
    tree (flax `s{i}b{j}`). Fused qkv / mlp 1x1 convs become Dense kernels;
    GroupNorm weight/bias become scale/bias (no running stats)."""
    def conv(src, dst, bias=False):
        if f"{src}.weight" in state:
            _set(params, dst + ("kernel",), _conv(state[f"{src}.weight"]))
            if bias and f"{src}.bias" in state:
                _set(params, dst + ("bias",), state[f"{src}.bias"])

    def conv1x1_dense(src, dst):
        if f"{src}.weight" in state:
            _set(params, dst + ("kernel",), state[f"{src}.weight"][:, :, 0, 0].T)
            if f"{src}.bias" in state:
                _set(params, dst + ("bias",), state[f"{src}.bias"])

    def bn(src, dst):
        if f"{src}.weight" not in state:
            return
        _set(params, dst + ("scale",), state[f"{src}.weight"])
        _set(params, dst + ("bias",), state[f"{src}.bias"])
        _set(stats, dst + ("mean",), state[f"{src}.running_mean"])
        _set(stats, dst + ("var",), state[f"{src}.running_var"])

    def gn(src, dst):
        if f"{src}.weight" not in state:
            return
        _set(params, dst + ("scale",), state[f"{src}.weight"])
        _set(params, dst + ("bias",), state[f"{src}.bias"])

    def cna(src, dst):  # ConvNormAct composite
        conv(f"{src}.conv", dst + ("conv",))
        bn(f"{src}.bn", dst + ("bn",))

    if f"{src_prefix}.stem.conv.weight" not in state:
        return
    cna(f"{src_prefix}.stem", dst_prefix + ("stem",))
    depths = {2: 2, 3: 4, 4: 3}
    for i in range(5):
        for j in range(2):
            sp = f"{src_prefix}.stages.{i}.{j}"
            dp = dst_prefix + (f"s{i}b{j}",)
            if f"{sp}.conv1_1x1.conv.weight" in state:  # inverted residual
                for part in ("conv1_1x1", "conv2_kxk", "conv3_1x1"):
                    cna(f"{sp}.{part}", dp + (part,))
            elif f"{sp}.conv_kxk.conv.weight" in state:  # mobilevit block
                cna(f"{sp}.conv_kxk", dp + ("conv_kxk",))
                conv(f"{sp}.conv_1x1", dp + ("conv_1x1",))
                for k in range(depths[i]):
                    tp = f"{sp}.transformer.{k}"
                    tdp = dp + (f"tf{k}",)
                    gn(f"{tp}.norm1", tdp + ("norm1",))
                    conv1x1_dense(f"{tp}.attn.qkv_proj",
                                  tdp + ("attn", "qkv_proj"))
                    conv1x1_dense(f"{tp}.attn.out_proj",
                                  tdp + ("attn", "out_proj"))
                    gn(f"{tp}.norm2", tdp + ("norm2",))
                    conv1x1_dense(f"{tp}.mlp.fc1", tdp + ("fc1",))
                    conv1x1_dense(f"{tp}.mlp.fc2", tdp + ("fc2",))
                gn(f"{sp}.norm", dp + ("norm",))
                cna(f"{sp}.conv_proj", dp + ("conv_proj",))


def _backbone_entries(src_prefix: str, dst_prefix: Tuple[str, ...], state,
                      params, stats):
    """Dispatch on what the checkpoint actually contains: timm resnet trunks
    carry `{p}.conv1.weight`, mobilevitv2 trunks `{p}.stem.conv.weight`."""
    _resnet_entries(src_prefix, dst_prefix, state, params, stats)
    _mobilevit_entries(src_prefix, dst_prefix, state, params, stats)


def _convbn(src_conv: str, src_bn: str, dst: Tuple[str, ...], state, params,
            stats):
    """ConvBN composite (Conv_0 + BatchNorm_0 inside)."""
    if src_conv not in state:
        return
    _set(params, dst + ("Conv_0", "kernel"), _conv(state[src_conv]))
    _set(params, dst + ("BatchNorm_0", "scale"), state[f"{src_bn}.weight"])
    _set(params, dst + ("BatchNorm_0", "bias"), state[f"{src_bn}.bias"])
    _set(stats, dst + ("BatchNorm_0", "mean"), state[f"{src_bn}.running_mean"])
    _set(stats, dst + ("BatchNorm_0", "var"), state[f"{src_bn}.running_var"])


def _decoder_ds(src: str, dst: Tuple[str, ...], state, params, stats,
                large: bool):
    """Decoder / DecoderDS FPN aggregators."""
    _convbn(f"{src}.conv1.0.weight", f"{src}.conv1.1", dst + ("conv1",),
            state, params, stats)
    key = "upsample_skip_convs" if large else "downsample_skip_convs"
    for i in range(4):
        sp = f"{src}.{key}.{i}"
        if f"{sp}.0.weight" not in state:
            continue
        name = f"skip{i + 2}" if large else f"skip{i + 1}"
        _convbn(f"{sp}.0.weight", f"{sp}.1", dst + (name,), state, params, stats)


def _basic_block(src: str, dst: Tuple[str, ...], state, params, stats):
    def conv(s, d):
        if s in state:
            _set(params, dst + (d, "kernel"), _conv(state[s]))

    def bn(s, d):
        if f"{s}.weight" not in state:
            return
        _set(params, dst + (d, "scale"), state[f"{s}.weight"])
        _set(params, dst + (d, "bias"), state[f"{s}.bias"])
        _set(stats, dst + (d, "mean"), state[f"{s}.running_mean"])
        _set(stats, dst + (d, "var"), state[f"{s}.running_var"])

    conv(f"{src}.conv1.weight", "conv1")
    bn(f"{src}.bn1", "bn1")
    conv(f"{src}.conv2.weight", "conv2")
    bn(f"{src}.bn2", "bn2")
    conv(f"{src}.downsample.0.weight", "ds_conv")
    bn(f"{src}.downsample.1", "ds_bn")


def _dense(src: str, dst: Tuple[str, ...], state, params, bias=True):
    if f"{src}.weight" not in state:
        return
    _set(params, dst + ("kernel",), state[f"{src}.weight"].T)
    if bias and f"{src}.bias" in state:
        _set(params, dst + ("bias",), state[f"{src}.bias"])


def _adain(src: str, dst: Tuple[str, ...], state, params):
    _dense(f"{src}.latent_affine", dst + ("latent_affine",), state, params)


def _conv_instance_norm(src: str, dst: Tuple[str, ...], state, params):
    if f"{src}.conv_act.0.weight" in state:
        _set(params, dst + ("conv", "kernel"),
             _conv(state[f"{src}.conv_act.0.weight"]))
        _set(params, dst + ("conv", "bias"), state[f"{src}.conv_act.0.bias"])
    _adain(f"{src}.adaptive_norm", dst + ("adain",), state, params)


def _decoder_block(src: str, dst: Tuple[str, ...], state, params):
    _conv_instance_norm(f"{src}.conv1", dst + ("conv1",), state, params)
    _conv_instance_norm(f"{src}.conv2", dst + ("conv2",), state, params)


def _style_head(src: str, dst: Tuple[str, ...], head: str, state, params):
    if head == "bev":
        mapping = {
            "segmentation_head.0": "seg",
            "instance_offset_head.0": "offset",
            "instance_center_head.0": "center",
        }
        for s, d in mapping.items():
            if f"{src}.{s}.weight" in state:
                _set(params, dst + (d, "kernel"), _conv(state[f"{src}.{s}.weight"]))
                _set(params, dst + (d, "bias"), state[f"{src}.{s}.bias"])
    else:
        torch_names = {
            "rgb": "rgb_head", "lidar_re": "lidar_re_head",
            "lidar_seg": "seg_head", "sem_image": "sem_head",
            "depth": "depth_head", "voxel": "segmentation_head",
        }
        s = f"{src}.{torch_names[head]}.0"
        if f"{s}.weight" in state:
            _set(params, dst + ("head", "kernel"), _conv(state[f"{s}.weight"]))
            _set(params, dst + ("head", "bias"), state[f"{s}.bias"])


def _bev_decoder(src: str, dst: Tuple[str, ...], head: str, state, params):
    if f"{src}.constant_tensor" in state:
        const = state[f"{src}.constant_tensor"]
        _set(params, dst + ("constant_tensor",),
             np.moveaxis(const, 0, -1))  # (C, ...) -> (..., C)
    _adain(f"{src}.first_norm", dst + ("first_norm",), state, params)
    _conv_instance_norm(f"{src}.first_conv", dst + ("first_conv",), state, params)
    for i in range(3):
        _decoder_block(f"{src}.middle_conv.{i}", dst + (f"middle_{i}",), state,
                       params)
    for i, name in ((1, "conv1"), (2, "conv2"), (3, "conv3")):
        _decoder_block(f"{src}.conv{i}", dst + (name,), state, params)
    for k in (4, 2, 1):
        _style_head(f"{src}.head_{k}", dst + (f"head_{k}",), head, state, params)


def _conv_decoder(src: str, dst: Tuple[str, ...], head: str, state, params):
    _dense(f"{src}.linear.0", dst + ("linear",), state, params)
    for i, idx in enumerate((0, 2, 4, 6)):
        s = f"{src}.pre_transpose_conv.{idx}"
        if f"{s}.weight" in state:
            _set(params, dst + (f"pre{i}", "kernel"), _deconv(state[f"{s}.weight"]))
            _set(params, dst + (f"pre{i}", "bias"), state[f"{s}.bias"])
    for i in (1, 2, 3):
        s = f"{src}.trans_conv{i}.0"
        if f"{s}.weight" in state:
            _set(params, dst + (f"trans_conv{i}", "kernel"),
                 _deconv(state[f"{s}.weight"]))
            _set(params, dst + (f"trans_conv{i}", "bias"), state[f"{s}.bias"])
    for k in (4, 2, 1):
        _style_head(f"{src}.head_{k}", dst + (f"head_{k}",), head, state, params)


def _feature_compressor(src: str, dst: Tuple[str, ...], state, params, stats):
    _basic_block(f"{src}.0", dst + ("block1",), state, params, stats)
    _basic_block(f"{src}.1", dst + ("block2",), state, params, stats)


def convert_rssm_section(state: Dict[str, np.ndarray], params: Dict,
                         prefix: str = "rssm"):
    """Map the reference RSSM's state_dict entries (transition.py:44-72 names,
    optionally '<prefix>.'-qualified) onto muvo_tpu's RSSM param tree."""
    _dense(f"{prefix}.pre_gru_net.0", ("rssm", "pre_gru"), state, params)
    if f"{prefix}.recurrent_model.weight_ih" in state:
        _set(params, ("rssm", "recurrent_model", "ih", "kernel"),
             state[f"{prefix}.recurrent_model.weight_ih"].T)
        _set(params, ("rssm", "recurrent_model", "ih", "bias"),
             state[f"{prefix}.recurrent_model.bias_ih"])
        _set(params, ("rssm", "recurrent_model", "hh", "kernel"),
             state[f"{prefix}.recurrent_model.weight_hh"].T)
        _set(params, ("rssm", "recurrent_model", "hh", "bias"),
             state[f"{prefix}.recurrent_model.bias_hh"])
    _dense(f"{prefix}.posterior_action_module.0",
           ("rssm", "posterior_action_fc"), state, params)
    _dense(f"{prefix}.prior_action_module.0", ("rssm", "prior_action_fc"),
           state, params)
    _dense(f"{prefix}.posterior.module.0", ("rssm", "posterior_net", "fc1"),
           state, params)
    _dense(f"{prefix}.posterior.module.2", ("rssm", "posterior_net", "fc2"),
           state, params)
    _dense(f"{prefix}.prior.module.0", ("rssm", "prior_net", "fc1"), state,
           params)
    _dense(f"{prefix}.prior.module.2", ("rssm", "prior_net", "fc2"), state,
           params)


def convert_reference_state_dict(state: Dict[str, np.ndarray], cfg):
    """Returns (params, batch_stats) nested dicts in muvo_tpu layout."""
    params: Dict = {}
    stats: Dict = {}
    large = bool(cfg.MODEL.TRANSFORMER.LARGE)

    _backbone_entries("encoder", ("encoder",), state, params, stats)
    # the frustum-BEV branch and the no-transformer MILE-style branch both
    # use the top-down Decoder for feat_decoder, regardless of LARGE
    # (mile.py:32-34, 164)
    feat_large = (large or bool(cfg.MODEL.TRANSFORMER.BEV)
                  or not cfg.MODEL.TRANSFORMER.ENABLED)
    _decoder_ds("feat_decoder", ("feat_decoder",), state, params, stats,
                feat_large)
    # lidar decoders: DecoderT (LARGE-dependent) in the transformer branch
    # (mile.py:78, 85), always the top-down Decoder in the no-transformer
    # branch (mile.py:252, 259)
    lidar_large = large or not cfg.MODEL.TRANSFORMER.ENABLED
    _backbone_entries("range_view_encoder", ("lidar_encoder",), state, params,
                      stats)
    _decoder_ds("range_view_decoder", ("lidar_decoder",), state, params, stats,
                lidar_large)
    _backbone_entries("point_pillar_encoder", ("lidar_encoder",), state, params,
                      stats)
    _decoder_ds("point_pillar_decoder", ("lidar_decoder",), state, params,
                stats, lidar_large)
    # PointPillarNet point-net: Sequential(Linear, BN1d, ReLU) x2
    # (common.py:682-706) -> fc{i}/bn{i} with masked-stats BatchNorm
    for i, li in enumerate((0, 3)):
        sp = f"point_pillars.point_net.net.{li}"
        if f"{sp}.weight" not in state:
            continue
        _dense(sp, ("point_pillars", f"fc{i}"), state, params)
        bnp = f"point_pillars.point_net.net.{li + 1}"
        _set(params, ("point_pillars", f"bn{i}", "scale"),
             state[f"{bnp}.weight"])
        _set(params, ("point_pillars", f"bn{i}", "bias"),
             state[f"{bnp}.bias"])
        _set(stats, ("point_pillars", f"bn{i}", "mean"),
             state[f"{bnp}.running_mean"])
        _set(stats, ("point_pillars", f"bn{i}", "var"),
             state[f"{bnp}.running_var"])

    if "type_embedding" in state:
        params["type_embedding"] = state["type_embedding"]

    # transformer
    for i in range(6):
        sp = f"transformer_encoder.layers.{i}"
        if f"{sp}.self_attn.in_proj_weight" not in state:
            continue
        dp = ("transformer", f"layer{i}")
        _set(params, dp + ("in_proj", "kernel"),
             state[f"{sp}.self_attn.in_proj_weight"].T)
        _set(params, dp + ("in_proj", "bias"),
             state[f"{sp}.self_attn.in_proj_bias"])
        _dense(f"{sp}.self_attn.out_proj", dp + ("out_proj",), state, params)
        _dense(f"{sp}.linear1", dp + ("linear1",), state, params)
        _dense(f"{sp}.linear2", dp + ("linear2",), state, params)
        for norm in ("norm1", "norm2"):
            _set(params, dp + (norm, "scale"), state[f"{sp}.{norm}.weight"])
            _set(params, dp + (norm, "bias"), state[f"{sp}.{norm}.bias"])

    # frustum-BEV fusion branch (mile.py:36-59): mono-depth decoder + 1x1
    # depth head + the 4x BEV down-sampler
    _decoder_ds("depth_decoder", ("depth_decoder",), state, params, stats,
                large=True)  # reference always uses the top-down Decoder here
    if "depth.weight" in state:
        _set(params, ("depth_head", "kernel"), _conv(state["depth.weight"]))
        _set(params, ("depth_head", "bias"), state["depth.bias"])
    for i, idx in enumerate((0, 2)):
        s = f"bev_down_sample_4.{idx}"
        if f"{s}.weight" in state:
            _set(params, ("bev_down_sample_4", f"Conv_{i}", "kernel"),
                 _conv(state[f"{s}.weight"]))
            _set(params, ("bev_down_sample_4", f"Conv_{i}", "bias"),
                 state[f"{s}.bias"])

    _feature_compressor("image_feature_conv", ("image_feature_conv",), state,
                        params, stats)
    _feature_compressor("lidar_feature_conv", ("lidar_feature_conv",), state,
                        params, stats)
    _feature_compressor("lidar_state_conv", ("lidar_state_conv",), state,
                        params, stats)
    _feature_compressor("final_state_conv", ("final_state_conv",), state,
                        params, stats)

    _resnet_entries("backbone_route.backbone", ("backbone_route",
                                                "ResNetFeatures_0"),
                    state, params, stats)
    _dense("backbone_route.fc", ("backbone_route", "fc"), state, params)
    _backbone_entries("backbone_bev", ("backbone_bev",), state, params, stats)

    _dense("speed_enc.0", ("speed_enc", "Dense_0"), state, params)
    _dense("speed_enc.2", ("speed_enc", "Dense_1"), state, params)
    _dense("features_combine", ("features_combine",), state, params)
    _dense("embedding_combine", ("embedding_combine",), state, params)

    convert_rssm_section(state, params)

    for i, idx in enumerate((0, 2, 4, 6)):
        _dense(f"policy.fc.{idx}", ("policy", f"Dense_{i}"), state, params)

    _bev_decoder("bev_decoder", ("bev_decoder",), "bev", state, params)
    _bev_decoder("voxel_decoder", ("voxel_decoder",), "voxel", state, params)
    _conv_decoder("rgb_decoder", ("rgb_decoder",), "rgb", state, params)
    _conv_decoder("lidar_re", ("lidar_re",), "lidar_re", state, params)
    _conv_decoder("lidar_segmentation", ("lidar_segmentation",), "lidar_seg",
                  state, params)
    _conv_decoder("sem_image_decoder", ("sem_image_decoder",), "sem_image",
                  state, params)
    _conv_decoder("depth_image_decoder", ("depth_image_decoder",), "depth",
                  state, params)
    return params, stats


def _merge_into(template, converted, path=""):
    """Overlay converted leaves onto the template tree; report misses."""
    missing = []
    merged = {}
    for key, value in template.items():
        sub_path = f"{path}/{key}"
        if isinstance(value, dict):
            sub_conv = converted.get(key, {})
            m, miss = _merge_into(value, sub_conv, sub_path)
            merged[key] = m
            missing.extend(miss)
        else:
            if key in converted:
                conv = np.asarray(converted[key])
                assert conv.shape == value.shape, (
                    f"{sub_path}: shape {conv.shape} != {value.shape}"
                )
                merged[key] = conv.astype(value.dtype)
            else:
                merged[key] = value
                missing.append(sub_path)
    return merged, missing


def load_reference_weights(path: str, params_template, cfg,
                           stats_template=None, strict: bool = False):
    """Load a reference .ckpt and overlay it onto the parameter template."""
    from muvo_tpu.training.checkpoint import load_torch_state_dict

    state = load_torch_state_dict(path)
    converted, stats = convert_reference_state_dict(state, cfg)
    merged, missing = _merge_into(params_template, converted)
    if missing:
        msg = f"{len(missing)} parameters not found in checkpoint"
        if strict:
            raise KeyError(msg + ": " + ", ".join(missing[:20]))
        print("Warning - " + msg)
    if stats_template is not None:
        merged_stats, _ = _merge_into(stats_template, stats)
        return merged, merged_stats
    return merged
