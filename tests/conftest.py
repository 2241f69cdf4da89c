"""Test configuration: force JAX onto a virtual 8-device CPU mesh so
sharding tests run without TPU hardware (SURVEY.md section 4).

Note: this environment ships an `axon` JAX plugin that pins
jax_platforms to "axon,cpu" regardless of the JAX_PLATFORMS env var, so
the override must go through jax.config after import."""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import tempfile

# bench.py's parent best-of-merges its scored line against (and writes
# back to) ARTIFACTS.json; tests that spawn it must never touch the
# repo's real artifact, so point it at a throwaway by default
os.environ.setdefault(
    "HYDRIUM_ARTIFACTS",
    os.path.join(tempfile.mkdtemp(prefix="hyd-test-arts-"),
                 "ARTIFACTS.json"))
# ...and on the rig-wide TPU flock: a live window watcher holds the
# real lock for minutes during wedged probes, which starves the
# bench-harness tests' wedge-scenario children into bogus failures
os.environ.setdefault(
    "HYDRIUM_TPU_LOCK",
    os.path.join(tempfile.mkdtemp(prefix="hyd-test-lock-"), "tpu.lock"))

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
