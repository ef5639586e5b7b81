"""Test configuration: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize registers the remote-TPU ("axon") JAX backend
at interpreter startup and sets JAX_PLATFORMS=axon, so plain env-var
overrides in conftest are too late. We force the platform through
jax.config before any backend is initialized (platform resolution is lazy),
and set the XLA host-device-count flag before the CPU client spins up.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def reference_src():
    """Make the read-only reference repo importable (torch-only modules:
    models/modules/losses import fine without torchaudio)."""
    ref = "/root/reference/src"
    if not os.path.isdir(ref):
        pytest.skip("reference repo not available")
    if ref not in sys.path:
        sys.path.insert(0, ref)
    return ref


@pytest.fixture(autouse=True)
def _hermetic_global_jax_config():
    """Keep the suite order-independent: cli.train/eval legitimately flip
    process-global JAX config (fast_prng -> rbg keys, persistent
    compilation cache); in-process tests that exercise them must not leak
    those flips into later tests (r3: test_training_reduces_loss[ge2e]
    failed only in the full suite because an earlier cli.train left the
    default PRNG impl at 'rbg', changing every later jax.random stream)."""
    prng = jax.config.jax_default_prng_impl
    cache = jax.config.jax_compilation_cache_dir
    yield
    if jax.config.jax_default_prng_impl != prng:
        jax.config.update("jax_default_prng_impl", prng)
    if jax.config.jax_compilation_cache_dir != cache:
        jax.config.update("jax_compilation_cache_dir", cache)
