"""Test configuration: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize registers the axon TPU backend and forces
jax_platforms to it; tests override back to CPU (fast, and gives us N
virtual devices for sharding tests). Set SE_TEST_PLATFORM=axon to run the
suite against the real TPU instead.
"""

import os

_platform = os.environ.get("SE_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if _platform == "cpu":
    # sitecustomize may already have pointed jax at the axon TPU backend;
    # force CPU regardless.
    jax.config.update("jax_platforms", "cpu")
