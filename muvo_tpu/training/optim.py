"""Optimizer construction: AdamW with decay masking, OneCycle LR, gradient
accumulation, optional layer freezing.

Mirrors reference muvo/trainer.py:1022-1073: no weight decay on 1-D params
(biases/norm scales), torch-OneCycleLR schedule (cos anneal, div_factor 25,
final_div_factor 1e4), optax.MultiSteps for ACCUMULATE_GRAD_BATCHES.
"""

from __future__ import annotations

import math

import jax
import optax


def make_schedule(cfg):
    if cfg.SCHEDULER.NAME == "none":
        return cfg.OPTIMIZER.LR
    if cfg.SCHEDULER.NAME == "OneCycleLR":
        # optax's onecycle divides by the warmup span pct_start*steps;
        # below one step that is NaN for EVERY step — only reachable in
        # tiny-STEPS smoke runs, where the tail shape doesn't matter.
        steps = max(cfg.STEPS, math.ceil(1.0 / cfg.SCHEDULER.PCT_START))
        return optax.cosine_onecycle_schedule(
            transition_steps=steps,
            peak_value=cfg.OPTIMIZER.LR,
            pct_start=cfg.SCHEDULER.PCT_START,
            div_factor=25.0,
            final_div_factor=1e4,
        )
    raise ValueError(f"Unknown scheduler: {cfg.SCHEDULER.NAME}")


def decay_mask(params):
    """True (decay) for rank>=2 params; biases/norms are not decayed."""
    return jax.tree_util.tree_map(lambda p: p.ndim > 1, params)


def frozen_mask(params, train_list):
    """True for params whose top-level module name is NOT in train_list."""

    def path_frozen(path, _):
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        return not any(top.startswith(t) for t in train_list)

    return jax.tree_util.tree_map_with_path(path_frozen, params)


def make_optimizer(cfg, params) -> optax.GradientTransformation:
    schedule = make_schedule(cfg)
    tx = optax.adamw(
        learning_rate=schedule,
        weight_decay=cfg.OPTIMIZER.WEIGHT_DECAY,
        mask=decay_mask(params),
    )
    if cfg.OPTIMIZER.FROZEN.ENABLED:
        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()},
            jax.tree_util.tree_map(
                lambda frozen: "frozen" if frozen else "train",
                frozen_mask(params, list(cfg.OPTIMIZER.FROZEN.TRAIN_LIST)),
            ),
        )
    accumulate = cfg.OPTIMIZER.ACCUMULATE_GRAD_BATCHES
    if accumulate > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate)
    return tx
