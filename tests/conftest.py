"""Test harness config: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated without TPU hardware via XLA's forced
host platform device count (SURVEY.md §4). The environment's sitecustomize
force-registers the axon TPU plugin at interpreter start, so merely setting
JAX_PLATFORMS is not enough — override through jax.config after import.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
