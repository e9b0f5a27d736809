"""Checkpointing via orbax + PyTorch checkpoint conversion.

Reference behaviour (train.py:19-48, muvo/trainer.py:202-211): checkpoints
carry the config and git metadata; loading strips the Lightning ``model.``
prefix. Here: orbax for native save/restore (async-capable, sharded);
``convert_torch_checkpoint`` maps a reference Lightning .ckpt state dict onto
our parameter tree for parity evaluation of released weights.
"""

from __future__ import annotations

import os
import subprocess
from typing import Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _git_metadata(repo_dir: Optional[str] = None) -> Dict[str, str]:
    repo_dir = repo_dir or os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
    def run(cmd):
        try:
            return subprocess.run(
                cmd, cwd=repo_dir, capture_output=True, text=True, timeout=10
            ).stdout.strip()
        except Exception:
            return ""
    return {
        "git_hash": run(["git", "rev-parse", "HEAD"]),
        "git_diff": run(["git", "diff", "--stat"]),
    }


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True
        )
        self.manager = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state, cfg_dict: Optional[Dict] = None,
             extra_metadata: Optional[Dict] = None):
        import json

        metadata = {**_git_metadata(), "world_size": jax.device_count()}
        if extra_metadata:
            metadata.update(extra_metadata)
        payload = {"state": state._asdict() if hasattr(state, "_asdict") else state}
        self.manager.save(step, args=ocp.args.StandardSave(payload))
        # orbax StandardSave is arrays-only; config + git metadata go to JSON.
        sidecar = {"metadata": metadata}
        if cfg_dict is not None:
            sidecar["config"] = cfg_dict
        with open(os.path.join(self.directory, f"meta_{step}.json"), "w") as f:
            json.dump(sidecar, f, indent=2, default=str)

    def restore(self, step: Optional[int] = None, template=None):
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            return None
        if template is not None:
            payload = {"state": template._asdict()
                       if hasattr(template, "_asdict") else template}
            restored = self.manager.restore(
                step, args=ocp.args.StandardRestore(payload)
            )
        else:
            restored = self.manager.restore(step)
        meta_path = os.path.join(self.directory, f"meta_{step}.json")
        if os.path.isfile(meta_path):
            import json

            with open(meta_path) as f:
                restored = dict(restored)
                restored.update(json.load(f))
        return restored

    def latest_step(self):
        return self.manager.latest_step()

    def wait(self):
        self.manager.wait_until_finished()


# ---------------------------------------------------------------------------
# PyTorch -> JAX weight conversion
# ---------------------------------------------------------------------------
def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch (O, I, kH, kW[, kD]) -> flax (kH, kW[, kD], I, O)."""
    rank = w.ndim
    if rank == 4:
        return np.transpose(w, (2, 3, 1, 0))
    if rank == 5:
        return np.transpose(w, (2, 3, 4, 1, 0))
    raise ValueError(f"unexpected conv kernel rank {rank}")


def _deconv_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose (I, O, kH, kW) -> lax.conv_transpose (kH, kW, I, O),
    spatially flipped."""
    w = w[:, :, ::-1, ::-1]
    return np.transpose(w, (2, 3, 0, 1)).copy()


def convert_torch_tensor(name: str, value: np.ndarray):
    """Classify-and-convert a single torch parameter by naming convention."""
    if name.endswith(".weight") and value.ndim in (4, 5):
        return _conv_kernel(value)
    if name.endswith(".weight") and value.ndim == 2:
        return value.T
    return value


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a reference Lightning checkpoint, stripping the 'model.' prefix."""
    import torch

    ckpt = torch.load(path, map_location="cpu")
    state = ckpt.get("state_dict", ckpt)
    out = {}
    for key, value in state.items():
        if key.startswith("model."):
            key = key[len("model."):]
        out[key] = value.detach().cpu().numpy()
    return out
