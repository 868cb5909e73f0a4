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

# Force the CPU backend: the image's sitecustomize registers the remote-TPU
# ("axon") platform and sets jax_platforms to it, overriding the env default
# above — config.update wins over both. Tests must run on the virtual
# 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")

# Golden-parity tests compare against torch f32; JAX's default conv/matmul
# precision is reduced. Production code keeps the default (bf16 MXU passes).
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the big jitted programs (full model, train
# step) dominate test wall-clock; cache them across runs.
_CACHE = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
_CACHE.mkdir(exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))


@pytest.fixture(scope="session")
def rng():
    import jax

    return jax.random.PRNGKey(0)
