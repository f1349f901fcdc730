"""Test configuration: force CPU with an 8-device virtual mesh.

Multi-chip sharding paths are exercised without TPU hardware
(SURVEY.md §4 implication), and numerics are deterministic fp32 — the
tunneled TPU would silently run fp32 matmuls at bf16 MXU precision.

Note: this environment preloads jax at interpreter startup
(/root/.axon_site/sitecustomize.py registers the axon TPU backend), so env
vars like JAX_PLATFORMS set here are read too late. jax.config.update works
as long as no backend has been initialized yet.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses tests may spawn
# Subprocesses must not load the axon sitecustomize at all: it creates the
# tunneled-TPU PJRT client during jax backend init EVEN under
# JAX_PLATFORMS=cpu, so a hung tunnel turns every subprocess CLI test into
# a timeout. The parent process is safe (jax.config.update below wins
# before any backend initializes), but spawned interpreters re-run
# sitecustomize from PYTHONPATH — drop the axon site dir for them.
os.environ["PYTHONPATH"] = os.pathsep.join(
    p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
    if p and "axon_site" not in p
)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (already imported by sitecustomize — config still mutable)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)


def pytest_configure(config):
    assert jax.default_backend() == "cpu", "tests must run on CPU"
    assert jax.device_count() == 8, "tests expect an 8-device virtual mesh"
