import os
import sys

# Tests run on a virtual 8-device CPU mesh so sharding logic is exercised
# without TPU hardware. The axon sitecustomize force-registers the TPU
# backend, so we must override via jax.config after import rather than env.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# Local persistent compile cache: with 2 host cores, cold XLA-CPU compiles
# of the engine programs take minutes; cached reruns take seconds. /tmp is
# machine-local, so the CPU-AOT cross-host SIGILL concern doesn't apply.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("RAV1D_JAX_CACHE_CPU", "/tmp/rav1d_jax_cache_cpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TEST_DATA = "/root/reference/tests/dav1d-test-data"


def vector_path(relpath: str) -> str:
    return os.path.join(TEST_DATA, relpath)
