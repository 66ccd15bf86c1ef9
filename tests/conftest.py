import os

# Tests ALWAYS run on a virtual 8-device CPU mesh: sharding logic is
# exercised without TPU hardware, and the real chip (exposed via the slow
# 'axon' tunnel) is reserved for bench.py.  Must be forced (not setdefault):
# the environment pre-sets JAX_PLATFORMS=axon.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# XLA:CPU compiles large unrolled uint32 graphs (field-mul chains)
# superlinearly; the persistent cache makes that a one-time cost across
# pytest runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_ms_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
