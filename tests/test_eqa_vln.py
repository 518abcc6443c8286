"""EQA / VLN task tests (mirrors reference test/test_mp3d_eqa.py structure on
procedural data)."""

import numpy as np
import jax.numpy as jnp
import pytest

from habitat_tpu.tasks.eqa import make_eqa_env
from habitat_tpu.tasks.vln import make_vln_env


def test_eqa_answer_accuracy():
    env = make_eqa_env(num_envs=4, num_scenes=1, episodes_per_scene=4)
    state, obs = env.reset(seed=0)
    assert obs["question"].shape == (4, 16)
    assert np.asarray(obs["question"]).max() > 0  # tokens present
    gt = np.asarray(env.table.extras["answer"])[np.asarray(state.ep_idx)]
    # answer correctly in env 0, incorrectly in others
    acts = np.full(4, env.answer_base + (gt[1] + 1) % 10)
    acts[0] = env.answer_base + gt[0]
    state, obs, r, done, info = env.step(state, jnp.asarray(acts))
    assert np.all(np.asarray(done))  # answering ends the episode
    acc = np.asarray(info["answer_accuracy"])
    assert acc[0] == 1.0
    assert acc[1] == 0.0
    # correct answer is rewarded (success_reward=10)
    assert float(np.asarray(r)[0]) > 5.0
    assert float(np.asarray(r)[1]) < 1.0
    # correct_answer measure reports gt
    np.testing.assert_array_equal(np.asarray(info["correct_answer"]), gt)


def test_eqa_nav_then_answer():
    env = make_eqa_env(num_envs=2, num_scenes=1, episodes_per_scene=4)
    state, obs = env.reset(seed=0)
    for _ in range(5):
        state, obs, r, d, info = env.step(state, jnp.zeros(2, jnp.int32))  # fwd
        assert not np.any(np.asarray(d))
    # episode still running, question unchanged
    assert np.asarray(obs["question"]).shape == (2, 16)


def test_vln_env():
    env = make_vln_env(num_envs=2, num_scenes=1, episodes_per_scene=4)
    state, obs = env.reset(seed=0)
    assert obs["instruction"].shape == (2, 64)
    assert np.asarray(obs["instruction"]).max() > 0
    i0 = np.asarray(obs["instruction"]).copy()
    state, obs, r, d, info = env.step(state, jnp.asarray([1, 2]))
    np.testing.assert_array_equal(np.asarray(obs["instruction"]), i0)
    assert "spl" in info


def test_vln_r2r_loader_schema():
    import json
    from habitat_tpu.tasks.vln import VLNDatasetV1

    ds = VLNDatasetV1()
    ds.from_json(
        json.dumps(
            {
                "instruction_vocab": {"walk": 1},
                "episodes": [
                    {
                        "episode_id": 1,
                        "scene_id": "sc",
                        "start_position": [0, 0, 0],
                        "start_rotation": [0, 0, 0, 1],
                        "goals": [{"position": [1, 0, 1], "radius": 3.0}],
                        "path": [[0, 0, 0], [1, 0, 1]],
                        "trajectory_id": 7,
                        "instruction": {
                            "instruction_text": "walk",
                            "instruction_tokens": [1],
                        },
                    }
                ],
            }
        )
    )
    assert len(ds.episodes) == 1
    ep = ds.episodes[0]
    assert ep.instruction.instruction_tokens == [1]
    assert ep.goals[0].radius == 3.0


def test_eqa_mp3d_loader_schema():
    import json
    from habitat_tpu.tasks.eqa import Mp3dEQADatasetV1

    ds = Mp3dEQADatasetV1()
    ds.from_json(
        json.dumps(
            {
                "question_vocab": {"word2idx_dict": {"what": 1}},
                "answer_vocab": {"word2idx_dict": {"red": 0}},
                "episodes": [
                    {
                        "episode_id": 0,
                        "scene_id": "sc",
                        "start_position": [0, 0, 0],
                        "start_rotation": [0, 0, 0, 1],
                        "goals": [{"position": [1, 0, 1]}],
                        "question": {
                            "question_text": "what colour is the sofa ?",
                            "answer_text": "red",
                            "question_tokens": [1, 2, 3, 4, 5, 6],
                            "answer_token": 0,
                        },
                    }
                ],
            }
        )
    )
    assert len(ds.episodes) == 1
    assert ds.episodes[0].question.answer_token == 0


def test_instance_image_goal_view_params():
    """Instance-image goals render from STORED camera params, not the
    default goal-point heading."""
    import numpy as np
    from habitat_tpu.core.dataset import build_episode_table
    from habitat_tpu.datasets.image_nav import (
        InstanceImageGoal,
        InstanceImageGoalNavEpisode,
        InstanceImageParameters,
    )
    from habitat_tpu.sims.procedural import generate_apartment

    scene = generate_apartment(seed=0, extent=6.0, n_rooms_per_axis=1)
    cam_pos = [3.0, 1.4, 3.0]
    ep = InstanceImageGoalNavEpisode(
        episode_id="ii0",
        scene_id=scene.scene_id,
        start_position=[2.0, 0.0, 2.0],
        start_rotation=[0, 0, 0, 1],
        goals=[
            InstanceImageGoal(
                position=[4.0, 0.0, 4.0],
                object_id="obj_1",
                image_goals=[
                    InstanceImageParameters(
                        position=cam_pos, rotation=[0, 0, 0, 1], hfov=79.0
                    )
                ],
            )
        ],
    )
    plain = InstanceImageGoalNavEpisode(
        episode_id="ii1",
        scene_id=scene.scene_id,
        start_position=[2.0, 0.0, 2.0],
        start_rotation=[0, 0, 0, 1],
        goals=[InstanceImageGoal(position=[4.0, 0.0, 4.0], object_id="obj_2")],
    )
    table = build_episode_table(
        [ep, plain],
        {scene.scene_id: scene},
        {scene.scene_id: 0},
        goal_image_size=32,
    )
    imgs = np.asarray(table.goal_image)
    assert imgs.shape == (2, 32, 32, 3)
    # both render, and the stored-params view differs from the default view
    assert imgs[0].std() > 0 and imgs[1].std() > 0
    assert np.abs(imgs[0].astype(int) - imgs[1].astype(int)).mean() > 1


def test_vln_seq2seq_il():
    """VLN agent: instruction LSTM + GPS/compass (no goal sensor) BC-trained
    on the geodesic follower — the instruction fully determines the goal, so
    teacher-matching accuracy must climb (reference R2R seq2seq baseline)."""
    import jax
    import numpy as np

    from habitat_tpu.baselines.il.bc_trainer import BCConfig, BCLearner
    from habitat_tpu.models.policy import make_pointnav_resnet_policy

    env = make_vln_env(
        num_envs=4, num_scenes=1, episodes_per_scene=8,
        with_pointgoal=False, max_episode_steps=100,
    )
    assert "instruction" in env.reset(seed=0)[1]
    policy = make_pointnav_resnet_policy(
        len(env.actions), backbone="resnet18", hidden_size=128,
        has_visual=False, goal_keys=(),
    )
    learner = BCLearner(env, policy, BCConfig(num_steps=16, lr=2e-3))
    ts = jax.jit(learner.init_fn)(jax.random.PRNGKey(0))
    step = jax.jit(learner.train_step)
    first = None
    for i in range(25):
        ts, m = step(ts)
        if first is None:
            first = float(m["losses/bc_loss"])
    last = float(m["losses/bc_loss"])
    assert np.isfinite(last)
    assert last < first, (first, last)


def test_instance_imagenav_reference_schema():
    """Load an episode JSON written in the EXACT reference schema —
    goals maps goal_key -> ONE goal dict, episodes carry goal_object_id,
    goal_key strips .glb/.basis (reference
    instance_image_nav_dataset.py:67-93, instance_image_nav_task.py:53)."""
    import json

    from habitat_tpu.datasets.image_nav import InstanceImageNavDatasetV1

    data = {
        "goals": {
            "scene1_42": {
                "position": [2.0, 0.1, 3.0],
                "radius": 0.5,
                "object_id": "42",
                "object_category": "chair",
                "view_points": [
                    {
                        "agent_state": {
                            "position": [1.5, 0.0, 2.5],
                            "rotation": [0, 0.707, 0, 0.707],
                        },
                        "iou": 0.8,
                    }
                ],
                "image_goals": [
                    {
                        "position": [1.0, 1.2, 2.0],
                        "rotation": [0.0, 0.3826834, 0.0, 0.9238795],
                        "hfov": 79.0,
                        "image_dimensions": [512, 512],
                    },
                    {
                        "position": [3.0, 1.4, 4.0],
                        "rotation": [0, 0, 0, 1],
                        "hfov": 90.0,
                        "image_dimensions": [256, 256],
                    },
                ],
            }
        },
        "episodes": [
            {
                "episode_id": "0",
                "scene_id": "data/scene_datasets/hm3d/scene1.glb",
                "start_position": [0.0, 0.0, 0.0],
                "start_rotation": [0, 0, 0, 1],
                "goal_object_id": "42",
                "goal_image_id": 1,
                "object_category": "chair",
                "info": {"geodesic_distance": 4.2},
            }
        ],
    }
    ds = InstanceImageNavDatasetV1()
    ds.from_json(json.dumps(data))
    assert len(ds.episodes) == 1
    ep = ds.episodes[0]
    assert ep.goal_key == "scene1_42"
    assert len(ep.goals) == 1
    g = ep.goals[0]
    assert g.object_category == "chair" and g.object_id == "42"
    assert len(g.image_goals) == 2
    ig = g.image_goals[ep.goal_image_id]
    assert ig.hfov == 90.0 and tuple(ig.image_dimensions) == (256, 256)
    assert g.view_points[0]["agent_state"]["position"] == [1.5, 0.0, 2.5]


def test_referent_vln_candidates_egocentric():
    """Referent VLN (round 5): two candidate goals, egocentric
    [fwd, right, is_red, is_blue] per candidate; the TRUE goal's candidate
    entry must point where the pointgoal sensor points, and the
    instruction must name exactly that candidate's color."""
    import numpy as np
    import jax

    from habitat_tpu.tasks.vln import VLN_VOCAB, make_vln_env

    env = make_vln_env(
        num_envs=4, num_scenes=2, episodes_per_scene=4,
        with_pointgoal=True, referent=True, max_episode_steps=50,
        scene_kw={"n_rooms_per_axis": 1, "n_clutter": 2},
    )
    state, obs = env.reset_fn(jax.random.PRNGKey(0))
    cands = np.asarray(obs["vln_candidates"])  # (N, 8)
    pg = np.asarray(obs["pointgoal_with_gps_compass"])  # (N, 2) [dist, ang]
    toks = np.asarray(obs["instruction"])
    red_id = VLN_VOCAB["red"]
    blue_id = VLN_VOCAB["blue"]
    for n in range(4):
        # which candidate is the true goal: the one matching the pointgoal
        d0 = np.hypot(cands[n, 0], cands[n, 1])
        d1 = np.hypot(cands[n, 4], cands[n, 5])
        dist = pg[n, 0]
        k = 0 if abs(d0 - dist) < abs(d1 - dist) else 1
        assert abs([d0, d1][k] - dist) < 1e-3
        # egocentric angle agreement: atan2(right, fwd) vs pointgoal angle
        fwd, right = cands[n, 4 * k], cands[n, 4 * k + 1]
        ang = np.arctan2(-right, fwd)  # pointgoal angle convention (ccw+)
        da = np.arctan2(np.sin(ang - pg[n, 1]), np.cos(ang - pg[n, 1]))
        assert abs(da) < 1e-2, (n, ang, pg[n, 1])
        # the instruction names the true candidate's color
        is_red = cands[n, 4 * k + 2] > 0.5
        has_red = red_id in toks[n]
        has_blue = blue_id in toks[n]
        assert has_red != has_blue
        assert has_red == bool(is_red)
        # candidates are symmetric: exactly one red and one blue
        assert cands[n, 2] + cands[n, 6] == 1.0
        assert cands[n, 3] + cands[n, 7] == 1.0


def test_referent_eqa_plumbing():
    """Referent EQA (round 5): env builds; the object table is symmetric
    (exactly one color per object, categories distinct); the question
    names a category present in the table and the stored answer equals
    that object's color. The GROUNDING proof (held-out accuracy vs
    token-ablated collapse) runs on TPU in
    scripts/train_eqa_referent_tpu.py — CPU-scale PPO transfers only
    partially (0.27 at 256 train episodes, 0.44 at 2048; the trend needs
    the 16k-episode TPU run)."""
    import numpy as np
    import jax

    from habitat_tpu.sims.procedural import OBJECT_CATEGORIES
    from habitat_tpu.tasks.eqa import (
        EQA_COLORS,
        make_referent_eqa_env,
        referent_eqa_vocab,
    )

    env = make_referent_eqa_env(
        num_envs=8, num_scenes=2, episodes_per_scene=8, max_episode_steps=6
    )
    state, obs = env.reset_fn(jax.random.PRNGKey(0))
    q = np.asarray(obs["question"])
    tbl = np.asarray(obs["eqa_objects"])
    C = len(OBJECT_CATEGORIES)
    K = 4
    vocab = referent_eqa_vocab()
    inv = {v: k for k, v in vocab.items()}
    rows = tbl.reshape(8, K, C + len(EQA_COLORS))
    # answer via the env's own measure table
    ans = np.asarray(env.table.extras["answer"])[np.asarray(state.ep_idx)]
    for n in range(8):
        assert np.all(rows[n, :, :C].sum(-1) == 1.0)
        assert np.all(rows[n, :, C:].sum(-1) == 1.0)
        cats = rows[n, :, :C].argmax(-1)
        assert len(set(cats.tolist())) == K  # distinct categories
        words = [inv.get(t, "<pad>") for t in q[n] if t > 0]
        named = [w for w in words if w in OBJECT_CATEGORIES]
        assert len(named) == 1
        k = int(np.where(cats == OBJECT_CATEGORIES.index(named[0]))[0][0])
        assert int(rows[n, k, C:].argmax()) == int(ans[n])
    # answering correctly ends the episode with accuracy 1 at that step
    a = jnp.asarray(env.answer_base + ans[:8].astype(np.int32))
    state2, obs2, r, done, info = env.step_fn(state, a)
    assert bool(jnp.all(done))
    assert float(jnp.mean(info["answer_accuracy"])) == 1.0
