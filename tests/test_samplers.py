"""Rearrange episode-generation samplers (reference
datasets/rearrange/samplers/: scene/object/target/art samplers)."""

import numpy as np

from habitat_tpu.tasks.rearrange.samplers import (
    ArtObjSpec,
    ArticulatedObjectStateSampler,
    BalancedSceneSampler,
    CompositeArticulatedObjectStateSampler,
    MultiSceneSampler,
    ObjectSampler,
    ObjectTargetSampler,
    SingleSceneSampler,
)


def test_scene_samplers():
    assert SingleSceneSampler("a").sample() == "a"
    ms = MultiSceneSampler(["a", "b", "b", "c"], seed=0)
    assert ms.num_scenes() == 3
    assert all(ms.sample() in ("a", "b", "c") for _ in range(10))
    bs = BalancedSceneSampler(["a", "b"], num_episodes=4)
    seq = []
    for i in range(4):
        bs.set_cur_episode(i)
        seq.append(bs.sample())
    assert seq == ["a", "a", "b", "b"]


def test_object_and_target_samplers():
    from habitat_tpu.sims.procedural import generate_apartment

    scene = generate_apartment(seed=1, n_rooms_per_axis=1, n_clutter=2)
    rng = np.random.default_rng(0)
    os_ = ObjectSampler(["cup", "bowl"], num_objects=(2, 3), min_separation=0.3)
    placements = os_.sample(scene, rng)
    assert 2 <= len(placements) <= 3
    pts = [np.asarray(p) for _, p, _ in placements]
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            assert np.linalg.norm(pts[i] - pts[j]) >= 0.3
    ts = ObjectTargetSampler(["cup"], use_receptacles=False)
    targets = ts.sample_targets(scene, placements, num_targets=2, rng=rng)
    assert len(targets) == 2
    for name, goal in targets.items():
        src = next(p for n, p, _ in placements if n == name)
        assert np.linalg.norm(np.asarray(goal) - np.asarray(src)) >= 0.5


def test_art_state_samplers_and_generator_integration():
    aos = [
        ArtObjSpec("kitchen_drawer_left", ("drawer_0",), ((0.0, 0.45),)),
        ArtObjSpec("fridge_a", ("door",), ((0.0, 2.0),)),
    ]
    s = ArticulatedObjectStateSampler("drawer", "drawer_0", (0.1, 0.3))
    rng = np.random.default_rng(0)
    out = s.sample(aos, rng)
    assert list(out) == ["kitchen_drawer_left"]
    assert 0.1 <= out["kitchen_drawer_left"]["drawer_0"] <= 0.3

    comp = CompositeArticulatedObjectStateSampler(
        [
            {"fridge_a": {"door": 1.5}},
            {"fridge_a": {"door": 0.0}, "missing": {"x": 1.0}},
        ]
    )
    out2 = comp.sample(aos, rng)
    assert set(out2) <= {"fridge_a"}

    # generator integration: sampled ao_states land in art_init_q
    from habitat_tpu.tasks.rearrange.generator import (
        build_rearrange_table,
        make_procedural_rearrange,
    )

    scenes, eps = make_procedural_rearrange(
        num_scenes=1, episodes_per_scene=8, seed=2, n_rooms_per_axis=1,
        n_clutter=0,
        ao_state_sampler=ArticulatedObjectStateSampler(
            "drawer", "drawer_0", (0.05, 0.25)
        ),
        art_objs=[ArtObjSpec("drawer_main", ("drawer_0",), ((0.0, 0.45),))],
    )
    assert all(ep.ao_states for ep in eps)
    scene_map = {s.scene_id: s for s in scenes}
    scene_index = {s.scene_id: i for i, s in enumerate(scenes)}
    table = build_rearrange_table(eps, scene_map, scene_index)
    q = np.asarray(table.art_init_q)
    assert (q >= 0.05 - 1e-6).all() and (q <= 0.25 + 1e-6).all()
    assert np.unique(q.round(4)).size > 1  # actually sampled, not constant
