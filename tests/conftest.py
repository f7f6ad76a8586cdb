"""Test configuration: run everything on a virtual 8-device CPU mesh so the
multi-chip sharding path is exercised without TPU hardware (SURVEY.md §4.4)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The environment's sitecustomize force-registers the axon TPU backend and
# resets jax_platforms to "axon,cpu"; override it back to CPU after import so
# tests never compile through the (slow, remote) TPU tunnel.
jax.config.update("jax_platforms", "cpu")

# The suite is XLA-compile-bound; persist compiled executables across runs.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def synthetic_dataset(tmp_path_factory):
    """Session-scoped tiny synthetic ActorsHQ dataset."""
    from humanrf_tpu.core.synthetic import SyntheticSceneConfig, generate_synthetic_dataset

    root = tmp_path_factory.mktemp("synth")
    cfg = SyntheticSceneConfig(
        num_cameras=8,
        width=48,
        height=48,
        num_frames=3,
        first_frame=0,
        center_start=(0.0, 0.0, -0.1),
        center_end=(0.0, 0.0, 0.1),
        grid_resolution=32,
    )
    data_dir = generate_synthetic_dataset(root, cfg)
    return data_dir, cfg


@pytest.fixture
def rng():
    return np.random.default_rng(0)
