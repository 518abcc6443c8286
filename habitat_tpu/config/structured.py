"""Structured config store: default schemas for every registered component.

Counterpart of the reference's attrs-dataclass schema + Hydra ConfigStore
(habitat-lab/habitat/config/default_structured_configs.py: actions :133-395,
lab sensors :398-756, measures :760+, agent/sim/task/dataset roots; baselines
side habitat-baselines/habitat_baselines/config/default_structured_configs.py).
Field names match the reference so reference YAML overrides merge cleanly.

Store entries: (group, name) -> (node dict, package). Defaults-list resolution
consults the store first, then YAML files under habitat_tpu/config/.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

from habitat_tpu.config.omega import Config


class ConfigStore:
    def __init__(self):
        self._store: Dict[Tuple[str, str], Tuple[dict, Optional[str]]] = {}

    def store(self, group: str, name: str, node: dict, package: Optional[str] = None):
        self._store[(group.strip("/"), name)] = (node, package)

    def get(self, group: str, name: str):
        return self._store.get((group.strip("/"), name))


cs = ConfigStore()

# ---------------------------------------------------------------------------
# habitat.* (lab side)
# ---------------------------------------------------------------------------

ENVIRONMENT = dict(
    max_episode_steps=1000,
    max_episode_seconds=10000000,
    iterator_options=dict(
        cycle=True,
        shuffle=True,
        group_by_scene=True,
        num_episode_sample=-1,
        max_scene_repeat_episodes=-1,
        max_scene_repeat_steps=int(1e4),
        step_repetition_range=0.2,
    ),
)

# sim sensors (reference default_structured_configs.py sim sensor configs)
RGB_SENSOR = dict(
    type="HabitatSimRGBSensor",
    height=480,
    width=640,
    hfov=90,
    position=[0.0, 1.25, 0.0],
    orientation=[0.0, 0.0, 0.0],
)
DEPTH_SENSOR = dict(
    type="HabitatSimDepthSensor",
    height=480,
    width=640,
    hfov=90,
    position=[0.0, 1.25, 0.0],
    orientation=[0.0, 0.0, 0.0],
    min_depth=0.0,
    max_depth=10.0,
    normalize_depth=True,
)
SEMANTIC_SENSOR = dict(
    type="HabitatSimSemanticSensor",
    height=480,
    width=640,
    hfov=90,
    position=[0.0, 1.25, 0.0],
    orientation=[0.0, 0.0, 0.0],
)

AGENT = dict(
    height=1.5,
    radius=0.1,
    sim_sensors={},
    is_set_start_state=False,
    start_position=[0.0, 0.0, 0.0],
    start_rotation=[0.0, 0.0, 0.0, 1.0],
)

SIMULATOR = dict(
    type="Sim-v0",
    forward_step_size=0.25,
    turn_angle=10,
    tilt_angle=15,
    create_renderer=False,
    requires_textures=True,
    lag_observations=0,
    auto_sleep=False,
    step_physics=True,
    concur_render=False,
    needs_markers=True,
    update_articulated_agent=True,
    scene="procedural",
    scene_dataset="default",
    additional_object_paths=[],
    seed="${habitat.seed}",
    default_agent_id=0,
    debug_render=False,
    kinematic_mode=False,
    allow_sliding=True,
    navmesh_settings=dict(
        cell_size=0.1,  # our navgrid resolution
        cell_height=0.2,
        agent_max_climb=0.2,
        agent_max_slope=45.0,
    ),
    habitat_sim_v0=dict(
        gpu_device_id=0,
        gpu_gpu=True,  # frames are device arrays natively
        allow_sliding=True,
        enable_physics=False,
        physics_config_file="./data/default.physics_config.json",
        leave_context_with_background_renderer=False,
        enable_gfx_replay_save=False,
    ),
    agents=dict(),
    agents_order=[],
    # TPU-engine knobs (no reference counterpart)
    tpu=dict(
        tri_chunk=128,
        slide_substeps=4,
        render_backend="auto",  # auto | xla | pallas
    ),
)

TASK_BASE = dict(
    type="Nav-v0",
    reward_measure=None,
    success_measure=None,
    success_reward=2.5,
    slack_reward=-0.01,
    end_on_success=False,
    goal_sensor_uuid="pointgoal",
    count_obj_collisions=True,
    lab_sensors=dict(),
    measurements=dict(),
    actions=dict(),
    physics_target_sps=60.0,
)

DATASET_BASE = dict(
    type="PointNav-v1",
    split="train",
    scenes_dir="data/scene_datasets",
    content_scenes=["*"],
    data_path="",
    # procedural generation knobs (TPU-native builtin dataset; no reference
    # counterpart — reference downloads episode archives)
    procedural=dict(
        enabled=True,
        num_scenes=4,
        episodes_per_scene=32,
        seed=0,
        extent=10.0,
        nav_res=0.1,
        closest_dist_limit=1.0,
        furthest_dist_limit=30.0,
        geodesic_to_euclid_ratio=1.1,
    ),
)

HABITAT = dict(
    seed=100,
    env_task="GymHabitatEnv",
    env_task_gym_dependencies=[],
    env_task_gym_id="",
    environment=ENVIRONMENT,
    simulator=SIMULATOR,
    task=TASK_BASE,
    dataset=DATASET_BASE,
    gym=dict(
        auto_name="",
        obs_keys=None,
        action_keys=None,
        achieved_goal_keys=[],
        desired_goal_keys=[],
    ),
)

cs.store(group="habitat", name="habitat_config_base", node=HABITAT, package="habitat")
cs.store(
    group="habitat/task",
    name="task_config_base",
    node=TASK_BASE,
    package="habitat.task",
)

# actions (reference :1964-2040)
for _name, _node in {
    "stop": dict(type="StopAction"),
    "move_forward": dict(type="MoveForwardAction"),
    "turn_left": dict(type="TurnLeftAction"),
    "turn_right": dict(type="TurnRightAction"),
    "look_up": dict(type="LookUpAction"),
    "look_down": dict(type="LookDownAction"),
    "teleport": dict(type="TeleportAction"),
    "velocity_control": dict(
        type="VelocityAction",
        lin_vel_range=[0.0, 0.25],
        ang_vel_range=[-10.0, 10.0],
        min_abs_lin_speed=0.025,
        min_abs_ang_speed=1.0,
        time_step=1.0,
    ),
}.items():
    cs.store(
        group="habitat/task/actions",
        name=_name,
        node=_node,
        package=f"habitat.task.actions.{_name}",
    )

# lab sensors (reference :398-756)
for _name, _key, _node in [
    ("pointgoal_sensor", "pointgoal", dict(type="PointGoalSensor", goal_format="POLAR", dimensionality=2)),
    (
        "pointgoal_with_gps_compass_sensor",
        "pointgoal_with_gps_compass",
        dict(type="PointGoalWithGPSCompassSensor", goal_format="POLAR", dimensionality=2),
    ),
    ("objectgoal_sensor", "objectgoal", dict(
        type="ObjectGoalSensor",
        goal_spec="TASK_CATEGORY_ID",
        goal_spec_max_val=50,
    )),
    ("compass_sensor", "compass", dict(type="CompassSensor")),
    ("gps_sensor", "gps", dict(type="GPSSensor", dimensionality=2)),
    ("heading_sensor", "heading", dict(type="HeadingSensor")),
    ("proximity_sensor", "proximity", dict(type="ProximitySensor", max_detection_radius=2.0)),
    ("imagegoal_sensor", "imagegoal", dict(type="ImageGoalSensor")),
]:
    cs.store(
        group="habitat/task/lab_sensors",
        name=_name,
        node=_node,
        package=f"habitat.task.lab_sensors.{_key}",
    )

# measurements (reference :760+)
for _name, _node in {
    "num_steps": dict(type="NumSteps"),
    "distance_to_goal": dict(type="DistanceToGoal", distance_to="POINT"),
    "success": dict(type="Success", success_distance=0.2),
    "spl": dict(type="SPL"),
    "soft_spl": dict(type="SoftSPL"),
    "collisions": dict(type="Collisions"),
    "distance_to_goal_reward": dict(type="DistanceToGoalReward"),
    "top_down_map": dict(
        type="TopDownMap",
        max_episode_steps="${habitat.environment.max_episode_steps}",
        map_padding=3,
        map_resolution=1024,
        draw_source=True,
        draw_border=True,
        draw_shortest_path=True,
        draw_view_points=True,
        draw_goal_positions=True,
        draw_goal_aabbs=True,
        fog_of_war=dict(draw=True, visibility_dist=5.0, fov=90),
    ),
}.items():
    cs.store(
        group="habitat/task/measurements",
        name=_name,
        node=_node,
        package=f"habitat.task.measurements.{_name}",
    )

# sim sensor group entries
for _name, _node in {
    "rgb_sensor": RGB_SENSOR,
    "depth_sensor": DEPTH_SENSOR,
    "semantic_sensor": SEMANTIC_SENSOR,
}.items():
    cs.store(group="habitat/simulator/sim_sensors", name=_name, node=_node)

cs.store(group="habitat/simulator/agents", name="agent_base", node=AGENT)

# dataset schema
cs.store(
    group="habitat/dataset",
    name="dataset_config_schema",
    node=DATASET_BASE,
    package="habitat.dataset",
)

# ---------------------------------------------------------------------------
# habitat_baselines.*
# ---------------------------------------------------------------------------

PPO_DEFAULTS = dict(
    clip_param=0.2,
    ppo_epoch=4,
    num_mini_batch=2,
    value_loss_coef=0.5,
    entropy_coef=0.01,
    lr=2.5e-4,
    eps=1.0e-5,
    max_grad_norm=0.2,
    num_steps=128,
    use_gae=True,
    use_linear_lr_decay=False,
    use_linear_clip_decay=False,
    gamma=0.99,
    tau=0.95,
    reward_window_size=50,
    use_normalized_advantage=False,
    hidden_size=512,
    use_clipped_value_loss=True,
    use_double_buffered_sampler=False,  # moot on TPU: rollout is one scan
)

DDPPO_DEFAULTS = dict(
    sync_frac=0.6,  # moot on TPU (lock-step SPMD); kept for config compat
    distrib_backend="ICI",  # reference: GLOO/NCCL; here: JAX collectives
    rnn_type="LSTM",
    num_recurrent_layers=1,
    backbone="resnet18",
    pretrained_weights="",
    pretrained=False,
    pretrained_encoder=False,
    train_encoder=True,
    reset_critic=True,
    force_distributed=False,
)

POLICY = dict(
    name="PointNavResNetPolicy",
    action_distribution_type="categorical",
    action_dist=dict(use_log_std=True, use_softplus=False, std_init=0.0),
    obs_transforms=dict(),
    hierarchical_policy=None,
    normalize_visual_inputs=False,
)

HABITAT_BASELINES = dict(
    trainer_name="ppo",
    updater_name="PPO",
    distrib_updater_name="DDPPO",
    torch_gpu_id=0,
    video_render_views=[],
    tensorboard_dir="tb",
    writer_type="tb",
    video_dir="video_dir",
    video_fps=10,
    test_episode_count=-1,
    eval_ckpt_path_dir="data/checkpoints",
    num_environments=16,
    num_processes=-1,  # deprecated alias in reference
    checkpoint_folder="data/checkpoints",
    num_updates=-1,
    num_checkpoints=10,
    checkpoint_interval=-1,
    total_num_steps=-1.0,
    log_interval=10,
    log_file="train.log",
    force_blind_policy=False,
    verbose=True,
    eval_keys_to_include_in_name=[],
    force_torch_single_threaded=True,  # moot on TPU; config compat
    load_resume_state_config=True,
    eval=dict(
        split="val",
        use_ckpt_config=True,
        should_load_ckpt=True,
        evals_per_ep=1,
        video_option=[],
        extra_sim_sensors=dict(),
    ),
    profiling=dict(capture_start_step=-1, num_steps_to_capture=-1),
    rl=dict(
        preemption=dict(
            append_slurm_job_id=False,
            save_resume_state_interval=100,
            save_state_batch_only=False,
        ),
        policy=dict(main_agent=POLICY),
        ppo=PPO_DEFAULTS,
        ddppo=DDPPO_DEFAULTS,
        ver=dict(
            variable_experience=True,
            num_inference_workers=2,
            overlap_rollouts_and_learn=False,
        ),
        auxiliary_losses=dict(),
        agent=dict(type="SingleAgentAccessMgr", num_pool_agents_per_type=[1]),
    ),
)

cs.store(
    group="habitat_baselines",
    name="habitat_baselines_rl_config_base",
    node=HABITAT_BASELINES,
    package="habitat_baselines",
)
