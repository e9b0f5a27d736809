"""Test harness: run JAX on a virtual 8-device CPU mesh.

Must set XLA flags before JAX initialises its backends.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force CPU even when JAX_PLATFORMS=axon is preset
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The container's axon sitecustomize force-registers the TPU backend and
# overrides JAX_PLATFORMS; the config update below wins.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

from muvo_tpu.utils.jax_setup import setup_jax  # noqa: E402

setup_jax()

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"
