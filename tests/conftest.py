import os

# Tests run on a virtual 8-device CPU mesh; the real TPU is exercised by
# bench.py.  Must be set before jax is imported anywhere, and must override
# any ambient platform selection (e.g. the axon TPU tunnel).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize registers the TPU plugin in every interpreter and
# pins the platform programmatically, overriding the env var — so force the
# config at jax import time too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
