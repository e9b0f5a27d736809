"""Training observability: scalar logging (JSONL + TensorBoard) and step
timing / throughput (frames-per-second-per-chip, the tracked north-star
metric).

Reference: TensorBoardLogger + 'simple' profiler (train.py:72-75, 111).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricsLogger:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self.jsonl_path = os.path.join(log_dir, "metrics.jsonl")
        self._jsonl = open(self.jsonl_path, "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def log(self, step: int, scalars: Dict[str, float], prefix: str = ""):
        record = {"step": int(step)}
        for key, value in scalars.items():
            name = f"{prefix}_{key}" if prefix else key
            value = float(value)
            record[name] = value
            if self._tb is not None:
                self._tb.add_scalar(name, value, step)
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()

    def log_image(self, step: int, name: str, image):
        """image: (H, W, 3) uint8."""
        if self._tb is not None:
            self._tb.add_image(name, image, step, dataformats="HWC")
        else:
            import numpy as np
            from PIL import Image

            out_dir = os.path.join(self.log_dir, "images")
            os.makedirs(out_dir, exist_ok=True)
            Image.fromarray(np.asarray(image)).save(
                os.path.join(out_dir, f"{name.replace('/', '_')}_{step}.png")
            )

    def log_video(self, step: int, name: str, frames, fps: int = 2):
        """frames: (T, H, W, 3) uint8. TB add_video when the encoder is
        available, else a horizontal film-strip image (same content)."""
        import numpy as np

        frames = np.asarray(frames)
        if self._tb is not None:
            try:
                import torch

                vid = torch.from_numpy(
                    frames.transpose(0, 3, 1, 2)[None])  # (1, T, C, H, W)
                self._tb.add_video(name, vid, step, fps=fps)
                return
            except Exception as e:
                # moviepy/codec missing: fall through to the strip, but say so
                # once — a silently dropped video panel hides real breakage.
                if not getattr(self, "_video_warned", False):
                    self._video_warned = True
                    import warnings

                    warnings.warn(
                        f"TB add_video failed ({type(e).__name__}: {e}); "
                        "falling back to film-strip images for all videos "
                        "this run.")
        strip = np.concatenate(list(frames), axis=1)
        self.log_image(step, f"{name}_strip", strip)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


class StepTimer:
    """Wall-clock step timing with warmup exclusion."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times = []
        self._last: Optional[float] = None
        self._count = 0

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self._count += 1
            if self._count > self.warmup:
                self.times.append(now - self._last)
        self._last = now

    @property
    def mean_step_time(self) -> float:
        return sum(self.times) / max(len(self.times), 1)

    def frames_per_second(self, frames_per_step: int, n_chips: int = 1) -> float:
        st = self.mean_step_time
        return frames_per_step / st / n_chips if st > 0 else 0.0
