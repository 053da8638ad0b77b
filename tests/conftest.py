"""Test configuration: force an 8-device virtual CPU platform.

All multi-device/sharding logic is exercised on a virtual CPU mesh exactly
as the driver's ``dryrun_multichip`` does; TPU runs reuse the same code with
a real mesh.
"""

import os

# The harness presets JAX_PLATFORMS=axon (hosted-TPU tunnel); hard-override
# it so unit tests run on the local virtual-CPU mesh, not over the tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
# This box has a single CPU core; persist compiled executables so repeated
# test runs skip XLA compilation.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
