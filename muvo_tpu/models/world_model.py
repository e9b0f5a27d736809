"""MUVO world model, TPU-native assembly.

Mirrors the reference model graph (reference: muvo/models/mile.py:15-402):
camera + LiDAR encoders, transformer token fusion (or frustum-pooled BEV
fusion), route/speed encoders, RSSM latent transition, policy head, and the
per-task decoders (BEV seg, RGB, LiDAR range/seg, camera sem/depth, 3-D
voxels). Layout NHWC; time axis handled by ``lax.scan`` inside the RSSM and
the imagination rollout.

Batch keys (channels-last):
    image (b,s,H,W,3), route_map (b,s,h,w,3), speed (b,s,1),
    intrinsics (b,s,3,3), extrinsics (b,s,4,4),
    throttle_brake (b,s,1), steering (b,s,1),
    range_view_pcd_xyzd (b,s,64,1024,4), points_raw/num_points (PointPillars),
    voxel (b,s,X,Y,Z), birdview_label, ...
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from muvo_tpu.models.backbones.resnet import build_backbone
from muvo_tpu.models.common import (
    BevDownSample4,
    CommandEncoder,
    Decoder,
    DecoderDS,
    FeatureCompressor,
    GpsEncoder,
    Policy,
    RouteEncode,
    SpeedEncoder,
    position_embedding_sine,
)
from muvo_tpu.models.frustum import FrustumPooling
from muvo_tpu.models.pointpillars import PointPillarNet
from muvo_tpu.models.rssm import RSSM
from muvo_tpu.models.stylegan import BevDecoder, ConvDecoder, VoxelDecoder
from muvo_tpu.models.transformer import TransformerEncoder
from muvo_tpu.utils.network import pack_sequence_dim, unpack_sequence_dim


class MuvoWorldModel(nn.Module):
    cfg: object

    def setup(self):
        cfg = self.cfg
        self.embedding_dim = cfg.MODEL.EMBEDDING_DIM
        self.receptive_field = cfg.RECEPTIVE_FIELD

        # ---- encoders ------------------------------------------------
        try:
            remat_enc = bool(cfg.MODEL.REMAT_ENCODER)
        except AttributeError:
            remat_enc = False
        self.encoder, self.encoder_info = build_backbone(
            cfg.MODEL.ENCODER.NAME, out_indices=(2, 3, 4), remat=remat_enc
        )

        if cfg.MODEL.TRANSFORMER.ENABLED:
            tf_c = cfg.MODEL.TRANSFORMER.CHANNELS
            decoder_cls = Decoder if cfg.MODEL.TRANSFORMER.LARGE else DecoderDS
            if cfg.MODEL.TRANSFORMER.BEV:
                self.feat_decoder = Decoder(tf_c)
                bev_ds = cfg.BEV.FEATURE_DOWNSAMPLE
                self.frustum_pooling = FrustumPooling(
                    size=(cfg.BEV.SIZE[0] // bev_ds, cfg.BEV.SIZE[1] // bev_ds),
                    scale=cfg.BEV.RESOLUTION * bev_ds,
                    offsetx=cfg.BEV.OFFSET_FORWARD / bev_ds,
                    dbound=cfg.BEV.FRUSTUM_POOL.D_BOUND,
                    downsample=8,
                    sparse=cfg.BEV.FRUSTUM_POOL.SPARSE,
                    sparse_count=cfg.BEV.FRUSTUM_POOL.SPARSE_COUNT,
                )
                self.depth_decoder = Decoder(tf_c)
                self.depth_head = nn.Conv(self.frustum_pooling.D, (1, 1))
                if not cfg.MODEL.TRANSFORMER.LARGE:
                    self.bev_down_sample_4 = BevDownSample4(tf_c)
            else:
                self.feat_decoder = decoder_cls(tf_c)

            if cfg.MODEL.LIDAR.ENABLED:
                if cfg.MODEL.LIDAR.POINT_PILLAR.ENABLED:
                    self.point_pillars = PointPillarNet()
                    self.lidar_encoder, _ = build_backbone(
                        cfg.MODEL.LIDAR.ENCODER, out_indices=(2, 3, 4),
                        remat=remat_enc,
                    )
                    self.lidar_decoder = decoder_cls(tf_c)
                else:
                    self.lidar_encoder, _ = build_backbone(
                        cfg.MODEL.LIDAR.ENCODER, out_indices=(2, 3, 4),
                        remat=remat_enc,
                    )
                    self.lidar_decoder = decoder_cls(tf_c)

            self.type_embedding = self.param(
                "type_embedding", nn.initializers.zeros, (1, 1, tf_c, 2)
            )
            self.transformer = TransformerEncoder(
                tf_c,
                n_layers=cfg.MODEL.TRANSFORMER.N_LAYERS,
                n_heads=cfg.MODEL.TRANSFORMER.N_HEADS,
                dim_feedforward=cfg.MODEL.TRANSFORMER.DIM_FEEDFORWARD,
            )
            self.image_feature_conv = FeatureCompressor(self.embedding_dim,
                                                        strides=(2, 1))
            self.lidar_feature_conv = FeatureCompressor(self.embedding_dim,
                                                        strides=(2, 1))
            feature_n = 2 * self.embedding_dim
            if cfg.MODEL.ROUTE.ENABLED:
                self.backbone_route = RouteEncode(
                    cfg.MODEL.ROUTE.CHANNELS, cfg.MODEL.ROUTE.BACKBONE
                )
                feature_n += cfg.MODEL.ROUTE.CHANNELS
            if cfg.MODEL.MEASUREMENTS.ENABLED:
                cc = cfg.MODEL.MEASUREMENTS.COMMAND_CHANNELS
                self.command_encoder = CommandEncoder(cc)
                self.command_next_encoder = CommandEncoder(cc)
                self.gps_encoder = GpsEncoder(cfg.MODEL.MEASUREMENTS.GPS_CHANNELS)
                feature_n += 2 * cc + cfg.MODEL.MEASUREMENTS.GPS_CHANNELS
            self.speed_enc = SpeedEncoder(cfg.MODEL.SPEED.CHANNELS,
                                          cfg.SPEED.NORMALISATION)
            feature_n += cfg.MODEL.SPEED.CHANNELS
            self.features_combine = nn.Dense(self.embedding_dim)

        else:
            out_c = cfg.MODEL.ENCODER.OUT_CHANNELS
            self.feat_decoder = Decoder(out_c)
            if not cfg.EVAL.NO_LIFTING:
                bev_ds = cfg.BEV.FEATURE_DOWNSAMPLE
                self.frustum_pooling = FrustumPooling(
                    size=(cfg.BEV.SIZE[0] // bev_ds, cfg.BEV.SIZE[1] // bev_ds),
                    scale=cfg.BEV.RESOLUTION * bev_ds,
                    offsetx=cfg.BEV.OFFSET_FORWARD / bev_ds,
                    dbound=cfg.BEV.FRUSTUM_POOL.D_BOUND,
                    downsample=8,
                    sparse=cfg.BEV.FRUSTUM_POOL.SPARSE,
                    sparse_count=cfg.BEV.FRUSTUM_POOL.SPARSE_COUNT,
                )
                self.depth_decoder = Decoder(out_c)
                self.depth_head = nn.Conv(self.frustum_pooling.D, (1, 1))
            if cfg.MODEL.ROUTE.ENABLED:
                self.backbone_route = RouteEncode(
                    cfg.MODEL.ROUTE.CHANNELS, cfg.MODEL.ROUTE.BACKBONE
                )
            if cfg.MODEL.MEASUREMENTS.ENABLED:
                cc = cfg.MODEL.MEASUREMENTS.COMMAND_CHANNELS
                self.command_encoder = CommandEncoder(cc)
                self.command_next_encoder = CommandEncoder(cc)
                self.gps_encoder = GpsEncoder(cfg.MODEL.MEASUREMENTS.GPS_CHANNELS)
            self.speed_enc = SpeedEncoder(cfg.MODEL.SPEED.CHANNELS,
                                          cfg.SPEED.NORMALISATION)
            if cfg.MODEL.LIDAR.ENABLED:
                if cfg.MODEL.LIDAR.POINT_PILLAR.ENABLED:
                    self.point_pillars = PointPillarNet()
                self.lidar_encoder, _ = build_backbone(
                    cfg.MODEL.LIDAR.ENCODER, out_indices=(2, 3, 4)
                )
                self.lidar_decoder = Decoder(cfg.MODEL.LIDAR.OUT_CHANNELS)
                self.lidar_state_conv = FeatureCompressor(self.embedding_dim,
                                                          strides=(2, 2))
                self.embedding_combine = nn.Dense(self.embedding_dim)
            self.backbone_bev, bev_info = build_backbone(
                cfg.MODEL.BEV.BACKBONE, out_indices=(3,)
            )
            self.final_state_conv = FeatureCompressor(self.embedding_dim,
                                                     strides=(2, 1))

        # ---- transition ----------------------------------------------
        if cfg.MODEL.TRANSITION.ENABLED:
            self.rssm = RSSM(
                embedding_dim=self.embedding_dim,
                action_dim=cfg.MODEL.ACTION_DIM,
                hidden_state_dim=cfg.MODEL.TRANSITION.HIDDEN_STATE_DIM,
                state_dim=cfg.MODEL.TRANSITION.STATE_DIM,
                action_latent_dim=cfg.MODEL.TRANSITION.ACTION_LATENT_DIM,
                use_dropout=cfg.MODEL.TRANSITION.USE_DROPOUT,
                dropout_probability=cfg.MODEL.TRANSITION.DROPOUT_PROBABILITY,
            )
            state_dim = (cfg.MODEL.TRANSITION.HIDDEN_STATE_DIM
                         + cfg.MODEL.TRANSITION.STATE_DIM)
        else:
            state_dim = self.embedding_dim
        self.state_dim = state_dim

        self.policy = Policy(in_channels=state_dim)

        # ---- decoders -------------------------------------------------
        # Optional rematerialisation: recompute decoder activations in the
        # backward pass instead of storing them (cfg.MODEL.REMAT).
        try:
            use_remat = bool(cfg.MODEL.REMAT)
        except AttributeError:
            use_remat = False
        try:
            remat_scope = str(cfg.MODEL.REMAT_SCOPE)
        except AttributeError:
            remat_scope = "all"
        if remat_scope not in ("all", "voxel"):
            raise ValueError(
                f"MODEL.REMAT_SCOPE must be 'all' or 'voxel', got "
                f"{remat_scope!r}")
        bev_cls, conv_cls, voxel_cls = BevDecoder, ConvDecoder, VoxelDecoder
        if use_remat:
            voxel_cls = nn.remat(VoxelDecoder)
            if remat_scope == "all":
                bev_cls = nn.remat(BevDecoder)
                conv_cls = nn.remat(ConvDecoder)

        # Decoder constant sizes are target_size / 2^6 (six 2x upsamplings):
        # reference hard-codes (5,13) = 320x832/64, (1,16) = 64x1024/64,
        # (3,3) = 192/64, (3,3,1) = (192,192,64)/64. Deriving them from config
        # preserves full-size parity and lets small-config tests stay small.
        crop_h = cfg.IMAGE.CROP[3] - cfg.IMAGE.CROP[1]
        crop_w = cfg.IMAGE.CROP[2] - cfg.IMAGE.CROP[0]
        img_const = (max(1, crop_h // 64), max(1, crop_w // 64))
        lidar_const = (max(1, cfg.POINTS.CHANNELS // 64),
                       max(1, cfg.POINTS.HORIZON_RESOLUTION // 64))
        bev_const = (max(1, cfg.BEV.SIZE[1] // 64), max(1, cfg.BEV.SIZE[0] // 64))
        voxel_const = tuple(max(1, v // 64) for v in cfg.VOXEL.SIZE)
        try:
            base_c = int(cfg.MODEL.DECODER_BASE_CHANNELS)
        except AttributeError:
            base_c = 512

        if cfg.SEMANTIC_SEG.ENABLED:
            self.bev_decoder = bev_cls(
                latent_n_channels=state_dim,
                semantic_n_channels=cfg.SEMANTIC_SEG.N_CHANNELS,
                constant_size=bev_const,
                head="bev", base_channels=base_c,
            )
        if cfg.EVAL.RGB_SUPERVISION:
            self.rgb_decoder = conv_cls(
                latent_n_channels=state_dim, out_channels=3,
                constant_size=img_const, head="rgb", base_channels=base_c,
            )
        if cfg.LIDAR_RE.ENABLED:
            self.lidar_re = conv_cls(
                latent_n_channels=state_dim,
                out_channels=cfg.LIDAR_RE.N_CHANNELS,
                constant_size=lidar_const, head="lidar_re", base_channels=base_c,
            )
        if cfg.LIDAR_SEG.ENABLED:
            self.lidar_segmentation = conv_cls(
                latent_n_channels=state_dim,
                out_channels=cfg.LIDAR_SEG.N_CLASSES,
                constant_size=lidar_const, head="lidar_seg", base_channels=base_c,
            )
        if cfg.SEMANTIC_IMAGE.ENABLED:
            self.sem_image_decoder = conv_cls(
                latent_n_channels=state_dim,
                out_channels=cfg.SEMANTIC_IMAGE.N_CLASSES,
                constant_size=img_const, head="sem_image", base_channels=base_c,
            )
        if cfg.DEPTH.ENABLED:
            self.depth_image_decoder = conv_cls(
                latent_n_channels=state_dim, out_channels=1,
                constant_size=img_const, head="depth", base_channels=base_c,
            )
        if cfg.VOXEL_SEG.ENABLED:
            self.voxel_decoder = voxel_cls(
                latent_n_channels=state_dim,
                semantic_n_channels=cfg.VOXEL_SEG.N_CLASSES,
                feature_channels=cfg.VOXEL_SEG.DIMENSION,
                constant_size=voxel_const,
            )

    # ==================================================================
    def encode(self, batch: Dict, train: bool = False) -> jnp.ndarray:
        """Per-frame sensor fusion -> (b, s, embedding_dim)."""
        cfg = self.cfg
        b, s = batch["image"].shape[:2]
        image = pack_sequence_dim(batch["image"])
        speed = pack_sequence_dim(batch["speed"])

        xs = self.encoder(image, train)
        x = self.feat_decoder(xs, train)

        if cfg.MODEL.TRANSFORMER.ENABLED:
            if cfg.MODEL.TRANSFORMER.BEV:
                intrinsics = pack_sequence_dim(batch["intrinsics"])
                extrinsics = pack_sequence_dim(batch["extrinsics"])
                depth = jax.nn.softmax(
                    self.depth_head(self.depth_decoder(xs, train)), axis=-1
                )
                x = self.frustum_pooling(x, depth, intrinsics, extrinsics)
                if not cfg.MODEL.TRANSFORMER.LARGE:
                    x = self.bev_down_sample_4(x)

            lidar_features = self._lidar_features(batch, train)

            h_i, w_i = x.shape[1:3]
            h_l, w_l = lidar_features.shape[1:3]
            tf_c = cfg.MODEL.TRANSFORMER.CHANNELS

            image_tokens = x + position_embedding_sine(h_i, w_i, tf_c // 2).astype(x.dtype)
            lidar_tokens = lidar_features + position_embedding_sine(
                h_l, w_l, tf_c // 2
            ).astype(lidar_features.dtype)
            image_tokens = image_tokens.reshape(-1, h_i * w_i, tf_c)
            lidar_tokens = lidar_tokens.reshape(-1, h_l * w_l, tf_c)
            image_tokens = image_tokens + self.type_embedding[:, :, :, 0]
            lidar_tokens = lidar_tokens + self.type_embedding[:, :, :, 1]

            tokens = jnp.concatenate([image_tokens, lidar_tokens], axis=1)
            # TP hint: shard the fusion transformer's channel dim (i.e. its
            # attention heads / FFN) over the mesh 'model' axis.
            from muvo_tpu.parallel.sharding import constrain

            tokens = constrain(tokens, ("data", None, "model"))
            # Pad ONCE to the flash block multiple and run all layers at the
            # padded length (true seq_len masks pad keys inside the kernel;
            # pad rows carry finite junk, sliced off below). The per-layer
            # pad/slice pairs the kernels would otherwise emit cost ~20
            # ms/step at 5,184 LARGE tokens (12 pads + 12 slices over the
            # (B, N, 512) token tensor, fwd+bwd).
            n_tok = tokens.shape[1]
            n_run = n_tok
            from muvo_tpu.ops.attention import _FLASH_MIN_TOKENS, _on_tpu

            if n_tok >= _FLASH_MIN_TOKENS and _on_tpu():
                from muvo_tpu.ops.flash_attention import padded_len

                n_run = padded_len(n_tok)
            if n_run != n_tok:
                tokens = jnp.pad(tokens,
                                 ((0, 0), (0, n_run - n_tok), (0, 0)))
                tokens = self.transformer(tokens, train, seq_len=n_tok)
                tokens = tokens[:, :n_tok]
            else:
                tokens = self.transformer(tokens, train)
            tokens = constrain(tokens, ("data", None, "model"))
            image_out = tokens[:, : h_i * w_i].reshape(-1, h_i, w_i, tf_c)
            lidar_out = tokens[:, h_i * w_i:].reshape(-1, h_l, w_l, tf_c)

            features = [
                self.image_feature_conv(image_out, train),
                self.lidar_feature_conv(lidar_out, train),
            ]
            if cfg.MODEL.ROUTE.ENABLED:
                route_map = pack_sequence_dim(batch["route_map"])
                features.append(self.backbone_route(route_map, train))
            if cfg.MODEL.MEASUREMENTS.ENABLED:
                features.extend(self._measurement_features(batch))
            features.append(self.speed_enc(speed))
            embedding = self.features_combine(jnp.concatenate(features, axis=-1))

        else:
            if not cfg.EVAL.NO_LIFTING:
                intrinsics = pack_sequence_dim(batch["intrinsics"])
                extrinsics = pack_sequence_dim(batch["extrinsics"])
                depth = jax.nn.softmax(
                    self.depth_head(self.depth_decoder(xs, train)), axis=-1
                )
                x = self.frustum_pooling(x, depth, intrinsics, extrinsics)

            h_b, w_b = x.shape[1:3]
            to_cat = [x]
            if cfg.MODEL.ROUTE.ENABLED:
                route_map = pack_sequence_dim(batch["route_map"])
                rf = self.backbone_route(route_map, train)
                to_cat.append(jnp.broadcast_to(rf[:, None, None, :],
                                               (rf.shape[0], h_b, w_b, rf.shape[-1])))
            if cfg.MODEL.MEASUREMENTS.ENABLED:
                for mf in self._measurement_features(batch):
                    to_cat.append(jnp.broadcast_to(
                        mf[:, None, None, :],
                        (mf.shape[0], h_b, w_b, mf.shape[-1]),
                    ))
            sf = self.speed_enc(speed)
            to_cat.append(jnp.broadcast_to(sf[:, None, None, :],
                                           (sf.shape[0], h_b, w_b, sf.shape[-1])))
            x = jnp.concatenate(to_cat, axis=-1)

            embedding = self.backbone_bev(x, train)[-1]
            embedding = self.final_state_conv(embedding, train)

            if cfg.MODEL.LIDAR.ENABLED:
                lidar_features = self._lidar_features(batch, train)
                lidar_embedding = self.lidar_state_conv(lidar_features, train)
                embedding = self.embedding_combine(
                    jnp.concatenate([embedding, lidar_embedding], axis=-1)
                )

        return unpack_sequence_dim(embedding, b, s)

    def _lidar_features(self, batch, train):
        cfg = self.cfg
        if cfg.MODEL.LIDAR.POINT_PILLAR.ENABLED:
            points = pack_sequence_dim(batch["points_raw"])
            num_points = pack_sequence_dim(batch["num_points"])
            pp = self.point_pillars(points, num_points, train)
            xs = self.lidar_encoder(pp, train)
        else:
            range_view = pack_sequence_dim(batch["range_view_pcd_xyzd"])
            xs = self.lidar_encoder(range_view, train)
        return self.lidar_decoder(xs, train)

    def _measurement_features(self, batch):
        route_command = pack_sequence_dim(batch["route_command"])
        gps_vector = pack_sequence_dim(batch["gps_vector"])
        route_command_next = pack_sequence_dim(batch["route_command_next"])
        gps_vector_next = pack_sequence_dim(batch["gps_vector_next"])
        return [
            self.command_encoder(route_command),
            self.command_next_encoder(route_command_next),
            self.gps_encoder(jnp.concatenate([gps_vector, gps_vector_next], -1)),
        ]

    # ==================================================================
    def decode_state(self, state: jnp.ndarray, b: int, s: int,
                     include_seg: bool = True) -> Dict:
        """Run all enabled decoders on packed state (b*s, state_dim)."""
        cfg = self.cfg
        output: Dict = {}
        if cfg.SEMANTIC_SEG.ENABLED and include_seg:
            output.update(unpack_sequence_dim(self.bev_decoder(state), b, s))
        if cfg.EVAL.RGB_SUPERVISION:
            output.update(unpack_sequence_dim(self.rgb_decoder(state), b, s))
        if cfg.LIDAR_RE.ENABLED:
            output.update(unpack_sequence_dim(self.lidar_re(state), b, s))
        if cfg.LIDAR_SEG.ENABLED:
            output.update(unpack_sequence_dim(self.lidar_segmentation(state), b, s))
        if cfg.SEMANTIC_IMAGE.ENABLED:
            output.update(unpack_sequence_dim(self.sem_image_decoder(state), b, s))
        if cfg.DEPTH.ENABLED:
            output.update(unpack_sequence_dim(self.depth_image_decoder(state), b, s))
        if cfg.VOXEL_SEG.ENABLED:
            voxel_out = self.voxel_decoder(state)
            # SP hint: shard the dense voxel grids' leading spatial dim over
            # 'model' (these are the largest activations in the graph).
            from muvo_tpu.parallel.sharding import constrain

            voxel_out = {
                k: constrain(v, ("data", "model", None, None, None))
                for k, v in voxel_out.items()
            }
            output.update(unpack_sequence_dim(voxel_out, b, s))
        return output

    # ==================================================================
    def __call__(self, batch: Dict, training: bool = False,
                 rng: Optional[jax.Array] = None) -> Tuple[Dict, Dict]:
        """Full reconstruction forward pass (reference mile.py:404-489)."""
        cfg = self.cfg
        b, s = batch["image"].shape[:2]
        embedding = self.encode(batch, train=training)

        output: Dict = {}
        if cfg.MODEL.TRANSITION.ENABLED:
            action = jnp.concatenate(
                [batch["throttle_brake"], batch["steering"]], axis=-1
            )
            state_dict = self.rssm(
                embedding, action, use_sample=True, training=training, rng=rng
            )
            output.update(state_dict)
            state = jnp.concatenate(
                [state_dict["posterior"]["hidden_state"],
                 state_dict["posterior"]["sample"]],
                axis=-1,
            )
        else:
            state = embedding
            state_dict = {}

        packed = pack_sequence_dim(state)
        policy_out = self.policy(packed)
        throttle_brake, steering = jnp.split(policy_out, 2, axis=-1)
        output["throttle_brake"] = unpack_sequence_dim(throttle_brake, b, s)
        output["steering"] = unpack_sequence_dim(steering, b, s)

        output.update(self.decode_state(packed, b, s))
        return output, state_dict

    # ==================================================================
    def observe_step(self, h_t, sample_t, action_t, embedding_t,
                     use_sample=True, rng=None):
        return self.rssm.observe_step(h_t, sample_t, action_t, embedding_t,
                                      use_sample=use_sample, rng=rng)

    def imagine_step(self, h_t, sample_t, action_t, use_sample=True, rng=None):
        return self.rssm.imagine_step(h_t, sample_t, action_t,
                                      use_sample=use_sample, rng=rng)

    def encode_frame(self, batch, train: bool = False):
        """Encode and return the embedding of the last frame: (b, C)."""
        return self.encode(batch, train=train)[:, -1]

    def policy_forward(self, state):
        """Policy head on a (b, state_dim) latent (for apply(method=...))."""
        return self.policy(state)

    # ==================================================================
    def imagine(self, batch: Dict, predict_action: bool = False,
                future_horizon: Optional[int] = None,
                rng: Optional[jax.Array] = None,
                use_sample: bool = True) -> Dict:
        """Prior rollout from a given latent state (reference mile.py:771-850).

        batch: hidden_state (b, C_h), sample (b, C_s), and — unless
        predict_action — throttle_brake / steering (b, T, 1).
        use_sample=False rolls the prior mean (deterministic; the reference
        hardcodes use_sample=True at mile.py:790 — the knob exists for
        cross-framework parity testing where torch/JAX noise can't match).
        """
        cfg = self.cfg
        assert cfg.MODEL.TRANSITION.ENABLED
        fh = future_horizon if future_horizon is not None else cfg.FUTURE_HORIZON
        h_t = batch["hidden_state"]
        sample_t = batch["sample"]
        b = h_t.shape[0]
        if rng is None:
            rng = jax.random.PRNGKey(0)
        keys = jax.random.split(rng, fh)

        if predict_action:
            actions_tm = jnp.zeros((fh, b, cfg.MODEL.ACTION_DIM), h_t.dtype)
        else:
            actions = jnp.concatenate(
                [batch["throttle_brake"][:, :fh], batch["steering"][:, :fh]], -1
            )
            actions_tm = jnp.swapaxes(actions, 0, 1)

        def step(carry, inp):
            h, smp = carry
            action_t, key = inp
            if predict_action:
                action_t = self.policy(jnp.concatenate([h, smp], axis=-1))
            prior = self.rssm.imagine_step(h, smp, action_t,
                                           use_sample=use_sample, rng=key)
            out = {
                "action": action_t,
                "hidden": prior["hidden_state"],
                "sample": prior["sample"],
                "state": jnp.concatenate(
                    [prior["hidden_state"], prior["sample"]], axis=-1
                ),
            }
            return (prior["hidden_state"], prior["sample"]), out

        if self.is_initializing():
            _, out0 = step((h_t, sample_t), (actions_tm[0], keys[0]))
            rolled = jax.tree_util.tree_map(
                lambda x: jnp.repeat(x[None], fh, axis=0), out0
            )
        else:
            _, rolled = jax.lax.scan(step, (h_t, sample_t), (actions_tm, keys))

        output = {
            k: jnp.swapaxes(v, 0, 1) for k, v in rolled.items()
        }  # (b, fh, ...)

        packed_state = pack_sequence_dim(output["state"])
        policy_out = self.policy(packed_state)
        throttle_brake, steering = jnp.split(policy_out, 2, axis=-1)
        output["throttle_brake"] = unpack_sequence_dim(throttle_brake, b, fh)
        output["steering"] = unpack_sequence_dim(steering, b, fh)

        output.update(self.decode_state(packed_state, b, fh))
        return output

    def observe_and_imagine(self, batch: Dict, predict_action: bool = False,
                            future_horizon: Optional[int] = None,
                            rng: Optional[jax.Array] = None):
        """Posterior observation over RF frames then prior imagination.

        (reference mile.py:684-769)
        """
        cfg = self.cfg
        fh = future_horizon if future_horizon is not None else cfg.FUTURE_HORIZON
        s = cfg.RECEPTIVE_FIELD
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        r1, r2 = jax.random.split(rng)

        past = {k: v[:, :s] for k, v in batch.items()}
        output_observe, state_dict = self(past, training=False, rng=r1)

        imagine_batch = {
            "hidden_state": state_dict["posterior"]["hidden_state"][:, -1],
            "sample": state_dict["posterior"]["sample"][:, -1],
        }
        if not predict_action:
            imagine_batch["throttle_brake"] = batch["throttle_brake"][:, s:]
            imagine_batch["steering"] = batch["steering"][:, s:]
        output_imagine = self.imagine(imagine_batch, predict_action, fh, rng=r2)
        return output_observe, output_imagine
