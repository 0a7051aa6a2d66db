import os

# Force tests onto a virtual 8-device CPU mesh: physics tests don't need the
# TPU, and the multi-chip sharding tests need multiple (virtual) devices.
# (The environment pre-sets JAX_PLATFORMS=axon, so this must override.)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
