"""Test harness: force an 8-device virtual CPU mesh so sharding paths are
exercised without TPU hardware.

Must run before any jax backend initializes.  The ambient environment may
preset JAX_PLATFORMS (e.g. to a TPU plugin); tests always force CPU — backend
selection is read lazily at first use, so overriding here is effective even
though sitecustomize may have imported jax already.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# jax snapshots JAX_PLATFORMS into its config at import time; if something
# (e.g. a TPU-plugin sitecustomize) imported jax before us, the env override
# above is ignored — force the config value directly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
