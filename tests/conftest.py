"""Test configuration.

Unit tests run on CPU with 8 virtual devices so multi-chip sharding
logic is exercised without a pod (SURVEY.md §4 implication d). Set
DIPPER_TEST_TPU=1 to run the suite against the real device instead.

NOTE: the sandbox's sitecustomize registers the `axon` TPU-tunnel PJRT
plugin in every interpreter and sets jax.config.jax_platforms to
"axon,cpu" — overriding the JAX_PLATFORMS env var. Every jit dispatch
and transfer then rides a network relay with multi-minute stalls. We
must override at the *config* level, after jax import.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import jax

if not os.environ.get("DIPPER_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/tmp/dipper_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running scale tests (deselect with "
        "-m 'not slow')")
