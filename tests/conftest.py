"""Test harness: force CPU with 8 virtual devices so multi-chip sharding
tests run without TPU hardware (the TPU-world substitute for fake-cluster
fixtures — SURVEY.md §4).

The environment pins JAX_PLATFORMS=axon (a remote TPU tunnel); unit tests
must run hermetically on host CPU.  Setting the env var alone is not enough
— pytest plugins may import jax before this conftest runs — so we also
update jax.config directly (effective until the backend is initialised).
Note: the axon PJRT backend does not support host callbacks
(pure_callback/io_callback), another reason the suite pins CPU.
"""

import os

import re

os.environ["JAX_PLATFORMS"] = "cpu"
# FORCE the count to 8 — a pre-existing different value (e.g. a CI
# wrapper exporting =1) would fail the multi-device sharding tests with
# confusing mesh-size errors instead of being corrected here
_flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                os.environ.get("XLA_FLAGS", "")).strip()
os.environ["XLA_FLAGS"] = (
    _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", (
    "tests must run on CPU, got " + jax.devices()[0].platform)
