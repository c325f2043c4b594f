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

# persistent jit-compilation cache: repeat test runs skip recompiles
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/midi_vae_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
