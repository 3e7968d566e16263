"""Test harness: force an 8-device virtual CPU mesh.

Multi-chip hardware is not available in CI; sharding paths are validated on
XLA's host-platform virtual devices (SURVEY.md section 4: the reference has no
tests at all — this harness is designed from scratch).

Note: the ambient environment registers a remote-TPU ("axon") PJRT plugin from
sitecustomize, which imports jax at interpreter boot with JAX_PLATFORMS=axon.
Env vars set here are therefore too late; we must override through
jax.config *before any backend is initialized*.
"""

import os

# Must precede first backend initialization (sitecustomize only registers the
# plugin; devices are created lazily, so this is still in time).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# Compile LOCALLY: some harnesses route XLA compilation to a remote service
# whose host CPU has a different feature set — the loaded AOT executables
# then differ numerically from locally-compiled ones (and warn about SIGILL
# risk), making results depend on where compilation happened.  Tests force
# the CPU platform anyway; local compilation keeps them reproducible
# per-machine.
os.environ["PALLAS_AXON_REMOTE_COMPILE"] = "0"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    # function-scoped: every test gets its own deterministic stream, so
    # adding/removing tests never shifts another test's random draws
    return np.random.default_rng(42)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches():
    # Every module compiles its own config-specialized programs; on a small
    # CI host the accumulated executables eventually abort the process
    # (SIGABRT ~45 tests in).  Dropping the in-memory cache per module keeps
    # the suite's footprint flat; the persistent on-disk compilation cache
    # still makes recompiles cheap.
    yield
    import gc
    jax.clear_caches()
    gc.collect()
