"""Environment suites: Endless (random spawns, no fixed route) and
Leaderboard (XML routes with weather groups), plus gymnasium registration.

Counterparts of reference carla_gym/envs/{endless_env, leaderboard_env}.py
and carla_gym/__init__.py:9-24.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import Dict, List, Optional

from muvo_tpu.sim.env import CarlaMultiAgentEnv

WEATHER_GROUPS = {
    "new": ["SoftRainSunset", "WetSunset"],
    "train": ["ClearNoon", "WetNoon", "HardRainNoon", "ClearSunset"],
    "simple": ["ClearNoon"],
    "dynamic": ["dynamic_1.0"],
}


def parse_routes_file(routes_xml_path: str) -> List[Dict]:
    """Leaderboard routes XML -> [{'route_id', 'town', 'waypoints'}].

    (reference: carla_gym/utils/config_utils.py:75-131)
    """
    routes = []
    tree = ET.parse(routes_xml_path)
    for route in tree.iter("route"):
        waypoints = []
        for wp in route.iter("waypoint"):
            waypoints.append([float(wp.attrib["x"]), float(wp.attrib["y"]),
                              float(wp.attrib["z"])])
        routes.append({
            "route_id": route.attrib.get("id"),
            "town": route.attrib.get("town"),
            "waypoints": waypoints,
        })
    return routes


class EndlessEnv(CarlaMultiAgentEnv):
    """Random spawn, no fixed route; endless driving for data collection.

    (reference: carla_gym/envs/endless_env.py)
    """

    def __init__(self, carla_map, host, port, seed, no_rendering, obs_configs,
                 reward_configs, terminal_configs,
                 num_zombie_vehicles=100, num_zombie_walkers=100,
                 weather_group="dynamic"):
        weathers = WEATHER_GROUPS.get(weather_group, [weather_group])
        all_tasks = []
        for weather in weathers:
            all_tasks.append({
                "weather": weather,
                "ego_vehicles": {"hero": {}},
                "scenario_actors": {},
                "num_zombie_vehicles": num_zombie_vehicles,
                "num_zombie_walkers": num_zombie_walkers,
            })
        super().__init__(carla_map, host, port, seed, no_rendering,
                         obs_configs, reward_configs, terminal_configs,
                         all_tasks)


class LeaderboardEnv(CarlaMultiAgentEnv):
    """Fixed routes from the leaderboard XML description.

    (reference: carla_gym/envs/leaderboard_env.py)
    """

    def __init__(self, carla_map, host, port, seed, no_rendering, obs_configs,
                 reward_configs, terminal_configs,
                 routes_xml: str, weather_group="train",
                 num_zombie_vehicles=100, num_zombie_walkers=100):
        routes = [r for r in parse_routes_file(routes_xml)
                  if r["town"] in (None, carla_map)]
        weathers = WEATHER_GROUPS.get(weather_group, [weather_group])
        all_tasks = []
        for route in routes:
            for weather in weathers:
                all_tasks.append({
                    "weather": weather,
                    "ego_vehicles": {
                        "hero": {
                            "spawn_transform": route["waypoints"][0] + [0, 0, 0],
                            "targets": route["waypoints"][1:],
                        }
                    },
                    "scenario_actors": {},
                    "num_zombie_vehicles": num_zombie_vehicles,
                    "num_zombie_walkers": num_zombie_walkers,
                    "route_id": route["route_id"],
                })
        super().__init__(carla_map, host, port, seed, no_rendering,
                        obs_configs, reward_configs, terminal_configs,
                        all_tasks)


def register_envs():
    """Register 'Endless-v0' and 'LeaderBoard-v0' with gymnasium."""
    import gymnasium as gym

    for env_id, cls in (("Endless-v0", EndlessEnv),
                        ("LeaderBoard-v0", LeaderboardEnv)):
        try:
            gym.register(id=env_id,
                         entry_point=f"muvo_tpu.sim.envs:{cls.__name__}")
        except Exception:
            pass  # already registered
