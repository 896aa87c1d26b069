"""Test configuration: force an 8-virtual-device CPU platform so sharding
tests exercise a real Mesh without TPU hardware."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The axon TPU plugin (sitecustomize) can force its own platform regardless
# of the env var; override again through the config API.
import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REFERENCE = pathlib.Path("/root/reference")


def reference_available():
    return REFERENCE.exists()


requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not mounted")
