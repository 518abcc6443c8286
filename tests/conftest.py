"""Test config: run on a virtual 8-device CPU mesh so multi-chip sharding
paths are exercised without TPU hardware (SURVEY §4 implication note).

Note: this image pre-imports jax and pins the default backend to the tunneled
'axon' TPU at interpreter start (sitecustomize), and ignores JAX_PLATFORMS.
The CPU client is created lazily, so setting XLA_FLAGS here (before first use)
still yields 8 virtual CPU devices; we then force default placement to CPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

CPU_DEVICES = jax.devices("cpu")
assert len(CPU_DEVICES) == 8, CPU_DEVICES
jax.config.update("jax_default_device", CPU_DEVICES[0])

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    return CPU_DEVICES


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


# -- smoke tier (VERDICT r2 weak #9): `pytest -m smoke` < 5 min -------------
# Whole-module marking: these modules are the fast, wide-coverage slice
# (registry/config contracts, task math, env/step semantics, renderer
# oracle, kinematics, wire protocols). Measured ~4 min on the 8-dev mesh.
_SMOKE_MODULES = {
    "test_registry_contract",
    "test_task_actions",
    "test_tasks",
    "test_render",
    "test_batched_env",
    "test_navgrid",
    "test_models",
    "test_fusedgen_math",
    "test_urdf",
    "test_arm",
    "test_unity_protocol",
    "test_pddl_yaml",
    "test_config",
    "test_scene",
    "test_sim_utilities",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in _SMOKE_MODULES:
            item.add_marker(pytest.mark.smoke)
