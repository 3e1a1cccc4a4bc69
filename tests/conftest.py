"""Test configuration: run the suite on a virtual 8-device CPU mesh.

SURVEY.md section 5.2 item 4: sharding-equivalence tests use
XLA_FLAGS=--xla_force_host_platform_device_count=8 on CPU so no TPU slice
is needed.

Note: this environment's sitecustomize imports jax at interpreter startup
with JAX_PLATFORMS=axon (remote TPU tunnel), so setting the env var here is
too late — we must override via jax.config before any backend initializes.
XLA_FLAGS is still read at CPU-client creation time, so setting it here
works as long as no jax computation ran yet.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compilation cache: ResNet-50 CPU compiles dominate suite time;
# cache them across pytest processes.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.devices()
