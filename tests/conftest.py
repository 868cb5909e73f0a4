"""Test harness: run everything on a virtual 8-device CPU mesh so the
multi-chip sharding paths are exercised without TPU hardware."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import pathlib
import sys

import jax
import pytest

# Golden-parity tests compare against torch f32; JAX's default conv/matmul
# precision is reduced. Production code keeps the default (bf16 MXU passes).
jax.config.update("jax_default_matmul_precision", "highest")

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))


@pytest.fixture(scope="session")
def rng():
    import jax

    return jax.random.PRNGKey(0)
