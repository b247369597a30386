"""Test configuration: force CPU with 8 virtual devices so multi-chip sharding
tests run without TPU hardware (SURVEY.md §4 test strategy).  Pallas kernels
run in interpret mode on CPU (selected automatically by the ops layer)."""

import os
import sys

# Force-override: the environment pins JAX_PLATFORMS=axon (remote TPU tunnel)
# and a sitecustomize imports jax at interpreter startup, so env vars alone are
# too late — use jax.config directly.  Tests run on local CPU with 8 virtual
# devices so multi-chip sharding is exercised without hardware.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
