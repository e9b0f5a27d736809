"""PPO expert agent + env obs/action processing (host-side).

Counterpart of reference rl_birdview/rl_birdview_agent.py and
rl_birdview/utils/rl_birdview_wrapper.py: flattens CARLA observations into
{birdview masks (NHWC), state vector}, maps the 2-d (acceleration, steer)
action onto throttle/steer/brake, and wraps the jitted policy for per-tick
inference during data collection. CARLA itself is optional — the returned
control is a plain dict unless the carla package is importable.

Note on the Beta action mapping: the policy emits actions in [0, 1]; they are
rescaled to the env action space ([-1, 1] for acc/steer) before control
conversion, matching the reference's action-space scaling.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from muvo_tpu.rl.policy import PpoPolicy


def process_obs(obs: Dict, input_states: List[str], train: bool = True) -> Dict:
    """CARLA obs dict -> {'birdview': (h, w, c), 'state': (n,)}."""
    state_list = []
    if "speed" in input_states:
        state_list.append(obs["speed"]["speed_xy"])
    if "speed_limit" in input_states:
        state_list.append(obs["control"]["speed_limit"])
    if "control" in input_states:
        state_list.append(obs["control"]["throttle"])
        state_list.append(obs["control"]["steer"])
        state_list.append(obs["control"]["brake"])
        state_list.append(obs["control"]["gear"] / 5.0)
    if "acc_xy" in input_states:
        state_list.append(obs["velocity"]["acc_xy"])
    if "vel_xy" in input_states:
        state_list.append(obs["velocity"]["vel_xy"])
    if "vel_ang_z" in input_states:
        state_list.append(obs["velocity"]["vel_ang_z"])
    state = np.concatenate(state_list).astype(np.float32)

    masks = obs["birdview"]["masks"]
    if masks.ndim == 3 and masks.shape[0] < masks.shape[-1]:
        masks = np.transpose(masks, (1, 2, 0))  # CHW -> HWC
    birdview = masks.astype(np.float32) / 255.0

    if not train:
        birdview = birdview[None]
        state = state[None]
    return {"birdview": birdview, "state": state}


def process_act(action: np.ndarray, acc_as_action: bool, train: bool = True):
    """Action vector -> vehicle control (throttle, steer, brake)."""
    if not train:
        action = action[0]
    if acc_as_action:
        acc, steer = np.asarray(action, np.float64)
        throttle, brake = (acc, 0.0) if acc >= 0.0 else (0.0, abs(acc))
    else:
        throttle, steer, brake = np.asarray(action, np.float64)
    throttle = float(np.clip(throttle, 0, 1))
    steer = float(np.clip(steer, -1, 1))
    brake = float(np.clip(brake, 0, 1))
    try:
        import carla

        return carla.VehicleControl(throttle=throttle, steer=steer, brake=brake)
    except ImportError:
        return {"throttle": throttle, "steer": steer, "brake": brake}


def scale_action(action: np.ndarray, low, high) -> np.ndarray:
    """Policy output in [0, 1] (Beta) -> env action space [low, high]."""
    return low + (high - low) * np.clip(action, 0.0, 1.0)


class RlBirdviewAgent:
    """Expert driver: obs -> policy -> control + supervision dict."""

    def __init__(self, policy: Optional[PpoPolicy] = None, params=None,
                 input_states: Tuple[str, ...] = ("control", "vel_xy"),
                 acc_as_action: bool = True,
                 action_low=(-1.0, -1.0), action_high=(1.0, 1.0)):
        self.policy = policy or PpoPolicy()
        self.params = params
        self.input_states = list(input_states)
        self.acc_as_action = acc_as_action
        self.action_low = np.asarray(action_low)
        self.action_high = np.asarray(action_high)
        self.supervision_dict: Dict = {}
        self._rng = jax.random.PRNGKey(0)
        self._forward = jax.jit(
            lambda p, bv, st, key: self.policy.apply(
                p, bv, st, key, deterministic=True
            )
        )

    def run_step(self, input_data: Dict, timestamp=None):
        policy_input = process_obs(input_data, self.input_states, train=False)
        if self.params is None:
            # No checkpoint given: initialise from the first observation so
            # collection still runs (an untrained expert — warn once).
            print("RlBirdviewAgent: no policy checkpoint, using random init")
            self.params = self.policy.init(
                jax.random.PRNGKey(0),
                jnp.asarray(policy_input["birdview"]),
                jnp.asarray(policy_input["state"]), jax.random.PRNGKey(1),
            )
        self._rng, key = jax.random.split(self._rng)
        actions, values, log_probs, p1, p2 = self._forward(
            self.params, jnp.asarray(policy_input["birdview"]),
            jnp.asarray(policy_input["state"]), key,
        )
        actions = np.asarray(actions)
        scaled = scale_action(actions, self.action_low, self.action_high)
        control = process_act(scaled, self.acc_as_action, train=False)

        throttle = control["throttle"] if isinstance(control, dict) else control.throttle
        steer = control["steer"] if isinstance(control, dict) else control.steer
        brake = control["brake"] if isinstance(control, dict) else control.brake
        self.supervision_dict = {
            "action": np.array([throttle, steer, brake], np.float32),
            "value": float(np.asarray(values)[0]),
            "action_mu": np.asarray(p1)[0],
            "action_sigma": np.asarray(p2)[0],
            "speed": input_data.get("speed", {}).get("forward_speed"),
        }
        return control

    def reset(self, log_file_path: str = ""):
        self._rng = jax.random.PRNGKey(0)
