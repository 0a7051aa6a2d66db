import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths can be
# exercised without TPU hardware; physics tests just use device 0.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)
