"""Test env: force the CPU backend with 8 virtual devices so sharding/mesh logic
is exercised without TPU hardware (the standard JAX fake-multi-device trick).

Note: this machine's sitecustomize registers an 'axon' TPU backend and sets
jax_platforms via jax.config (overriding the JAX_PLATFORMS env var), so we must
override through jax.config as well — env vars alone are not enough.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not os.environ.get("SWIFTLLM_KEEP_PLATFORM"):
    jax.config.update("jax_platforms", "cpu")
