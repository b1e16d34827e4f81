"""Test harness config: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated without TPU hardware via XLA's forced
host platform device count (SURVEY.md §4). The environment's sitecustomize
force-registers the axon TPU plugin at interpreter start, so merely setting
JAX_PLATFORMS is not enough — override through jax.config after import.
"""

import os

import re as _re

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
elif not _re.search(r"xla_force_host_platform_device_count=8\b", _flags):
    # a pre-set DIFFERENT device count breaks every 8-way mesh test with
    # obscure shape errors (r5 review): override to the suite's contract
    os.environ["XLA_FLAGS"] = _re.sub(
        r"xla_force_host_platform_device_count=\d+",
        "xla_force_host_platform_device_count=8", _flags)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
