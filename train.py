"""Training entry point.

TPU-native counterpart of the reference train.py: builds the config, data
module, trainer; runs the jitted SPMD train loop with periodic validation,
checkpointing and metric logging.

Usage:
    python train.py --config-file muvo_tpu/configs/muvo.yml [KEY VALUE ...]
"""

from __future__ import annotations

from muvo_tpu.utils.jax_setup import setup_jax

setup_jax()

import os
import socket
import time

import jax
import numpy as np

from muvo_tpu.config import get_cfg, get_parser
from muvo_tpu.data.dataset import make_dataset
from muvo_tpu.data.loader import DataLoader, device_prefetch
from muvo_tpu.parallel.mesh import make_mesh
from muvo_tpu.training.checkpoint import CheckpointManager
from muvo_tpu.training.logging import MetricsLogger, StepTimer
from muvo_tpu.training.trainer import WorldModelTrainer


def main():
    args = get_parser().parse_args()
    cfg = get_cfg(args)

    # glibc arena bloat from the threaded decode workers leaked ~65 MB
    # RSS/step in the r4 health runs (flat ndarray bytes, growing RSS —
    # see utils/hostmem.py); cap arenas BEFORE any loader thread spawns
    from muvo_tpu.utils.hostmem import cap_malloc_arenas, trim_host_heap

    cap_malloc_arenas(2)

    run_name = time.strftime("%d%B%Yat%H_%M_%S") + "_" + socket.gethostname() + \
        "_" + cfg.TAG.replace(" ", "_").replace(",", "")[:48]
    log_dir = os.path.join(cfg.LOG_DIR, run_name)
    logger = MetricsLogger(log_dir)
    print(f"Logging to {log_dir}; devices: {jax.devices()}")

    mesh = make_mesh()
    trainer = WorldModelTrainer(cfg, mesh=mesh)

    seq_len = cfg.RECEPTIVE_FIELD + cfg.FUTURE_HORIZON
    train_ds = make_dataset(cfg, "train", seq_len)
    train_loader = DataLoader(train_ds, cfg.BATCHSIZE, shuffle=True,
                              num_workers=min(cfg.N_WORKERS, 1))
    # the reference validates on all three strided val splits
    # (muvo/data/dataset.py:40-68); val splits that don't exist on disk
    # (common in small local runs) are skipped with a note
    from muvo_tpu.data.datamodule import make_val_samplers

    val_datasets = []
    for i in range(3):
        try:
            val_datasets.append(make_dataset(cfg, f"val{i}", seq_len))
        except Exception as e:
            print(f"val{i} unavailable ({e}); skipping")
            val_datasets.append(None)
    lengths = [len(ds) if ds is not None else 1 for ds in val_datasets]
    val_loaders = [
        (i, DataLoader(ds, cfg.BATCHSIZE, shuffle=False, sampler=sampler))
        for i, (ds, sampler) in enumerate(
            zip(val_datasets, make_val_samplers(lengths)))
        if ds is not None
    ]

    example = next(iter(DataLoader(train_ds, cfg.BATCHSIZE, shuffle=False)))
    state = trainer.init_state(example)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    print(f"Model parameters: {n_params / 1e6:.2f}M")

    ckpt = CheckpointManager(os.path.join(log_dir, "checkpoints"))
    start_step = 0
    # resume: own run dir first, else an explicit checkpoint dir / torch ckpt
    restored = ckpt.restore(template=state)
    if restored is None and cfg.PRETRAINED.PATH:
        path = cfg.PRETRAINED.PATH
        if os.path.isdir(path):
            restored = CheckpointManager(path).restore(template=state)
        elif path.endswith((".ckpt", ".pt", ".pth")) and os.path.isfile(path):
            from muvo_tpu.training.weight_convert import load_reference_weights

            params = load_reference_weights(path, state.params, cfg)
            state = state._replace(params=params)
            print(f"Loaded converted reference weights from {path}")
    if restored is not None:
        from muvo_tpu.training.trainer import TrainState

        state = TrainState(**restored["state"])
        start_step = int(state.step)
        print(f"Resumed from step {start_step}")

    train_step = trainer.make_train_step()
    eval_step = trainer.make_eval_step()
    rng = jax.random.PRNGKey(42)

    from muvo_tpu.training.optim import make_schedule

    schedule = make_schedule(cfg)
    # profiler window: trace steps [3, 3+PROFILE_STEPS) once compiled+warm
    profile_start = 3 if cfg.PROFILE_STEPS else -1
    profile_stop = profile_start + cfg.PROFILE_STEPS

    timer = StepTimer()
    step = start_step
    frames_per_step = cfg.BATCHSIZE * seq_len
    # resumable iterator state: (seed, epoch)-deterministic shuffle lets a
    # restored run skip to the exact batch it stopped at (SURVEY §5.3)
    steps_per_epoch = max(1, len(train_loader))
    epoch = start_step // steps_per_epoch
    skip = start_step % steps_per_epoch
    while step < cfg.STEPS:
        train_loader.set_epoch(epoch)
        for batch in device_prefetch(train_loader.iter_from(skip), mesh):
            if step >= cfg.STEPS:
                break
            if step == profile_start:
                jax.profiler.start_trace(os.path.join(log_dir, "profile"))
            state, metrics = train_step(state, batch, rng)
            step += 1
            timer.tick()
            if step == profile_stop and profile_start > 0:
                jax.block_until_ready(metrics)
                jax.profiler.stop_trace()
                print(f"profiler trace saved to {log_dir}/profile")

            if step % cfg.LOGGING_INTERVAL == 0 or step <= 2:
                # bound RSS: return glibc free-list pages to the OS (µs-ms;
                # the leak signature and root cause are in utils/hostmem.py)
                trim_host_heap()
                scalars = {k: float(np.asarray(v)) for k, v in metrics.items()}
                if os.environ.get("MUVO_MEMDEBUG"):
                    # host-leak triage: RSS vs Python-visible ndarray bytes
                    # vs jax-client-held arrays. Diverging RSS with flat
                    # ndarray AND jax-live bytes = leak below Python (e.g.
                    # the device client's transfer buffers).
                    import gc

                    nd = sum(a.nbytes for a in gc.get_objects()
                             if isinstance(a, np.ndarray))
                    live = jax.live_arrays()
                    jx = sum(a.nbytes for a in live)
                    rss = [l for l in open("/proc/self/status")
                           if l.startswith("VmRSS")][0].split()[1]
                    print(f"  memdebug step {step}: rss={int(rss) / 1e6:.2f}GB "
                          f"ndarrays={nd / 1e9:.2f}GB "
                          f"jax_live={len(live)}/{jx / 1e9:.2f}GB",
                          flush=True)
                scalars["fps_per_chip"] = timer.frames_per_second(
                    frames_per_step, jax.device_count()
                )
                scalars["lr"] = float(schedule(step)) if callable(schedule) \
                    else float(schedule)
                logger.log(step, scalars, prefix="train")
                print(f"step {step}: loss={scalars['loss']:.4f} "
                      f"fps/chip={scalars['fps_per_chip']:.2f}")

            if step % cfg.VAL_CHECK_INTERVAL == 0:
                for vi, val_loader in val_loaders:
                    val_metrics = {}
                    for i, vbatch in enumerate(
                            device_prefetch(iter(val_loader), mesh)):
                        if i >= cfg.LIMIT_VAL_BATCHES:
                            break
                        out = eval_step(state, vbatch, rng)
                        for k, v in out["losses"].items():
                            val_metrics[k] = (val_metrics.get(k, 0)
                                              + float(np.asarray(v)))
                        if i == 0:
                            try:
                                from muvo_tpu.training.visualise import (
                                    visualise_step,
                                )

                                pb = jax.jit(
                                    lambda b: trainer.preprocess(
                                        b, training=False)
                                )(vbatch)
                                panels = visualise_step(
                                    cfg, pb, out["output"],
                                    out.get("output_imagine"),
                                )
                                for name, img in panels.items():
                                    if name.startswith("video/"):
                                        logger.log_video(
                                            step, f"val{vi}/{name[6:]}", img)
                                    else:
                                        logger.log_image(
                                            step, f"val{vi}/{name}", img)
                            except Exception as e:
                                print(f"visualisation failed: {e}")
                    logger.log(step, val_metrics, prefix=f"val{vi}")
                ckpt.save(step, jax.device_get(state),
                          cfg_dict=cfg.convert_to_dict())
        epoch += 1
        skip = 0

    ckpt.save(step, jax.device_get(state), cfg_dict=cfg.convert_to_dict())
    ckpt.wait()
    logger.close()
    print(f"Training complete at step {step}.")


if __name__ == "__main__":
    main()
