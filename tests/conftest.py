"""Test harness config.

Tests run on CPU with 8 virtual devices so pjit/sharding paths are
exercised without TPU hardware (SURVEY.md §4). Must run before jax import.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Force CPU. The session env (and an interpreter-startup sitecustomize that
# imports jax) pins JAX_PLATFORMS to the TPU plugin, so the env var is
# already baked into jax.config by the time this conftest runs — only a
# config update works. RAIE_TEST_PLATFORM=axon runs the suite on hardware.
jax.config.update("jax_platforms", os.environ.get("RAIE_TEST_PLATFORM", "cpu"))

# Parity tests compare against torch fp32; TPU-style low-precision matmuls
# would dominate the tolerance budget.
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


requires_reference = pytest.mark.skipif(
    not reference_available(),
    reason="PyTorch reference repo not mounted at /root/reference",
)


@pytest.fixture(scope="session")
def reference_root() -> str:
    return REFERENCE_ROOT


@pytest.fixture(scope="session")
def torch_kdlae_module(reference_root):
    """Import the reference KDLAE model module as a numerics oracle."""
    torch = pytest.importorskip("torch")  # noqa: F841
    path = os.path.join(reference_root, "KDLAE")
    if path not in sys.path:
        sys.path.insert(0, path)
    import KDLAE_model  # type: ignore

    return KDLAE_model


@pytest.fixture(scope="session")
def torch_asdqe_module(reference_root):
    torch = pytest.importorskip("torch")  # noqa: F841
    path = os.path.join(reference_root, "ASDQE")
    if path not in sys.path:
        sys.path.insert(0, path)
    import ASDQE_model  # type: ignore

    return ASDQE_model
