"""Test harness config: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes, hence module-level os.environ.
"""

import os

# The axon sitecustomize force-sets JAX_PLATFORMS=axon,cpu before any
# user code runs, so a plain env default is not enough — override the
# config after import (platform init is lazy, so this is still early
# enough as long as no backend has been touched).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("INSV2V_ABLATE", None)  # never let perf-ablation hooks leak in
# the LOVEU runner setdefaults INSV2V_AOT_PIPELINE=1 for its workers;
# pin it off for the suite (unconditionally — the shell may have it
# exported) so app smoke tests don't write AOT entries; tests that want
# the AOT path set it explicitly via monkeypatch
os.environ["INSV2V_AOT_PIPELINE"] = "0"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.devices()[0].platform == "cpu", jax.devices()
assert jax.device_count() == 8, jax.devices()
