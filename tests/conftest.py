"""Test configuration: force an 8-device virtual CPU platform.

All multi-device/sharding logic is exercised on a virtual CPU mesh exactly
as the driver's ``dryrun_multichip`` does; TPU runs reuse the same code with
a real mesh.

Gotcha (this container): ``sitecustomize.py`` imports jax and registers the
hosted-TPU ('axon') PJRT plugin before any test code runs, so neither
``JAX_PLATFORMS=cpu`` in the environment nor ``XLA_FLAGS=--xla_force_host_
platform_device_count=8`` has any effect by the time conftest executes.
The only reliable switches are the late-bound config options below.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)
# This box has a single CPU core; persist compiled executables so repeated
# test runs skip XLA compilation.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

assert jax.device_count() == 8, (
    f"expected 8 virtual CPU devices, got {jax.device_count()} on "
    f"{jax.default_backend()}"
)


import pytest


@pytest.fixture(autouse=True)
def _reset_spmd_globals():
    """The mesh layer installs process-global SPMD state (partition-safe
    top-k flag, ambient kernel mesh).  Reset after every test so ordering
    can't leak one test's mesh into another's single-device path."""
    yield
    from samble_tpu.kernels import spmd
    from samble_tpu.ops import topk

    spmd.install_mesh(None)
    topk.set_spmd(False)
