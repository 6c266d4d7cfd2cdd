import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware (see SURVEY.md §4). Must be set before jax
# import anywhere in the test process.
os.environ["JAX_PLATFORMS"] = "cpu"
# the axon sitecustomize registers the TPU backend whenever this is set; clear
# it so tests really run on the virtual CPU mesh (the TPU is exercised by
# bench.py and the driver's compile checks instead)
os.environ["PALLAS_AXON_POOL_IPS"] = ""
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
