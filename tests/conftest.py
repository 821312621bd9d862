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

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tracked_session():
    """ONE tracked synthetic sequence shared by every module that needs a
    populated MapState (e2e asserts, BA builders, eval/velocity/g2o tests).
    Consumers must deepcopy the map before mutating it.

    Returns dict(sysm, reports, scene, cfg, ds).
    """
    from tests.test_pipeline_e2e import small_config
    from vdo_slam_tpu.io.dataset import SyntheticDataset
    from vdo_slam_tpu.io.synthetic import make_scene
    from vdo_slam_tpu.pipeline import System

    scene = make_scene(num_frames=8, width=320, height=240, num_objects=2,
                       seed=3)
    cfg = small_config(scene)
    ds = SyntheticDataset(scene, depth_map_factor=1.0, bf=40.0)
    sysm = System(cfg, enable_local_ba=False, enable_global_ba=False)
    reports = sysm.run_sequence(ds, verbose=True)
    return {"sysm": sysm, "reports": reports, "scene": scene, "cfg": cfg,
            "ds": ds}
