"""muvo_tpu: a TPU-native JAX/Pallas rebuild of the MUVO multimodal generative
world model for autonomous driving (reference: fzi-forschungszentrum-informatik/muvo).

Compute path: JAX/XLA + Pallas kernels, SPMD over `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"

from muvo_tpu.config import get_cfg, get_parser, CfgNode  # noqa: F401
