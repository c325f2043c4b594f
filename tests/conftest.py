"""Test config: run JAX on a virtual 8-device CPU mesh.

The TPU-native answer to multi-chip testing without a cluster (SURVEY.md §4):
shardings are exercised on 8 virtual CPU devices via XLA flags.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
