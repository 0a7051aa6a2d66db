import os

# Force tests onto a virtual 8-device CPU mesh: physics tests don't need the
# TPU, and the multi-chip sharding tests need multiple (virtual) devices.
# Under pytest, jax may already be imported by a plugin before this conftest
# runs, so setting the env var alone is not enough — update the jax config
# directly (legal as long as no backend has been initialized yet).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
