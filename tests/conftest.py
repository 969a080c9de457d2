"""Test harness: run everything on a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4's implication: the reference has no test suite; we build
one with multi-device coverage via XLA host-platform device simulation.

NOTE: the environment pre-imports jax via an axon sitecustomize hook and sets
JAX_PLATFORMS=axon (remote TPU tunnel), so plain env-var settings here are too
late. `jax.config.update('jax_platforms', ...)` before the first backend query
still wins, and XLA_FLAGS is read at CPU-client creation, so both overrides
below are effective.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-compiling end-to-end test")
