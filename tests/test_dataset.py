"""Dataset / EpisodeIterator semantics — ports the reference's iterator test
coverage (reference test/test_dataset.py, 378 LoC) onto the rewritten
deque-based scheduler (habitat_tpu/core/dataset.py): grouping, splits,
forced scene switches (episode- and step-counted), cycling with shuffle,
sampling, and the goals→shortest-path-cache invalidation contract.

Pure host-side python — no sim, no jax arrays.
"""

from itertools import groupby, islice

import pytest

from habitat_tpu.core.dataset import (
    Dataset,
    Episode,
    NavigationEpisode,
    NavigationGoal,
)



def _construct_dataset(num_episodes, num_groups=10):
    episodes = [
        Episode(
            episode_id=str(i),
            scene_id=f"scene_id_{i % num_groups}",
            start_position=[0, 0, 0],
            start_rotation=[0, 0, 0, 1],
        )
        for i in range(num_episodes)
    ]
    ds = Dataset()
    ds.episodes = episodes
    return ds


def test_scene_ids():
    ds = _construct_dataset(100)
    assert ds.scene_ids == [f"scene_id_{i}" for i in range(10)]


def test_get_scene_episodes():
    ds = _construct_dataset(100)
    eps = ds.get_scene_episodes("scene_id_0")
    assert len(eps) == 10
    assert all(e.scene_id == "scene_id_0" for e in eps)


def test_filter_episodes():
    ds = _construct_dataset(100)
    filtered = ds.filter_episodes(lambda e: int(e.episode_id) % 2 == 0)
    assert len(filtered.episodes) == 50
    assert all(int(e.episode_id) % 2 == 0 for e in filtered.episodes)


@pytest.mark.parametrize(
    "num_episodes,num_splits",
    [(994, 64), (1023, 64), (1024, 64), (1025, 64), (10000, 9), (10000, 10)],
)
def test_get_splits_sizes(num_episodes, num_splits):
    ds = _construct_dataset(num_episodes)
    splits = ds.get_splits(num_splits, allow_uneven_splits=True)
    assert len(splits) == num_splits
    assert sum(len(s.episodes) for s in splits) == num_episodes
    splits = ds.get_splits(num_splits, allow_uneven_splits=False)
    assert len(splits) == num_splits
    assert (
        sum(len(s.episodes) for s in splits)
        == (num_episodes // num_splits) * num_splits
    )


def test_get_splits_collate_scenes():
    ds = _construct_dataset(10000)
    for split in ds.get_splits(10, collate_scene_ids=True):
        # every scene appears as one contiguous block
        seen = set()
        for i, ep in enumerate(split.episodes):
            if ep.scene_id in seen:
                assert split.episodes[i - 1].scene_id == ep.scene_id
            seen.add(ep.scene_id)


def test_get_splits_sort_by_episode_id():
    ds = _construct_dataset(10000)
    for split in ds.get_splits(10, sort_by_episode_id=True):
        ids = [e.episode_id for e in split.episodes]
        assert ids == sorted(ids)


def test_sample_episodes():
    ds = _construct_dataset(1000)
    assert len(list(ds.get_episode_iterator(num_episode_sample=1000, cycle=False))) == 1000
    assert len(list(ds.get_episode_iterator(num_episode_sample=0, cycle=False))) == 0
    with pytest.raises(ValueError):
        ds.get_episode_iterator(num_episode_sample=1001, cycle=False)

    it = ds.get_episode_iterator(num_episode_sample=100, cycle=True)
    sampled = [e.episode_id for e in islice(it, 100)]
    assert len(set(sampled)) == 100
    assert next(it).episode_id in sampled  # cycling stays inside the sample

    it = ds.get_episode_iterator(num_episode_sample=0, cycle=False)
    with pytest.raises(StopIteration):
        next(it)


def test_iterator_cycle_in_order():
    ds = _construct_dataset(100)
    it = ds.get_episode_iterator(cycle=True, shuffle=False, group_by_scene=False)
    for i in range(200):
        assert next(it).episode_id == ds.episodes[i % 100].episode_id

    it = ds.get_episode_iterator(cycle=True, num_episode_sample=20)
    first = [e.episode_id for e in islice(it, 20)]
    for i in range(200):
        assert next(it).episode_id == first[i % 20]


def test_iterator_shuffle_regroups_each_cycle():
    ds = _construct_dataset(100)
    it = ds.get_episode_iterator(shuffle=True)
    first = list(islice(it, 100))
    second = list(islice(it, 100))
    key = lambda e: (e.scene_id, e.episode_id)
    assert sorted(first, key=key) == sorted(second, key=key)
    assert [e.episode_id for e in first] != [e.episode_id for e in second]
    for round_eps in (first, second):
        scene_runs = [k for k, _ in groupby(round_eps, key=lambda e: e.scene_id)]
        assert len(scene_runs) == len(set(scene_runs)) == 10


def test_iterator_deterministic_under_seed():
    ds = _construct_dataset(100)
    a = [e.episode_id for e in islice(ds.get_episode_iterator(shuffle=True, seed=7), 150)]
    b = [e.episode_id for e in islice(ds.get_episode_iterator(shuffle=True, seed=7), 150)]
    c = [e.episode_id for e in islice(ds.get_episode_iterator(shuffle=True, seed=8), 150)]
    assert a == b
    assert a != c


def test_iterator_scene_switching_episodes():
    total_ep, max_repeat = 1000, 25
    ds = _construct_dataset(total_ep)
    it = ds.get_episode_iterator(
        max_scene_repeat_episodes=max_repeat, shuffle=False, cycle=True
    )
    expected = sorted(ds.episodes, key=lambda e: e.scene_id)

    for _ in range(max_repeat):
        assert next(it).episode_id == expected.pop(0).episode_id
    # the next pull is forced off the current scene
    assert next(it).scene_id != expected.pop(0).scene_id

    remaining = list(islice(it, total_ep - max_repeat - 1))
    assert len(remaining) == len(expected)
    # all scenes still show up exactly once per contiguous run
    assert len({e.scene_id for e in remaining}) == len(
        {e.scene_id for e in remaining}
    )

    cycled = list(islice(it, 4 * total_ep))
    assert len({e.episode_id for e in cycled}) == total_ep  # nothing leaks
    runs = [list(g) for _, g in groupby(cycled, key=lambda e: e.scene_id)]
    assert len(sum(runs, [])) == 4 * total_ep
    assert len(runs) == 4 * total_ep / max_repeat
    assert all(len(run) == max_repeat for run in runs)


def test_iterator_scene_switching_episodes_no_shuffle_no_cycle():
    total_ep, max_repeat = 1000, 25
    ds = _construct_dataset(total_ep)
    it = ds.get_episode_iterator(
        max_scene_repeat_episodes=max_repeat, shuffle=False, cycle=False
    )
    runs = [list(g) for _, g in groupby(it, key=lambda e: e.scene_id)]
    assert len(sum(runs, [])) == total_ep
    assert len(runs) == total_ep / max_repeat
    assert all(len(run) == max_repeat for run in runs)


def test_iterator_scene_switching_steps():
    total_ep, max_steps = 1000, 250
    ds = _construct_dataset(total_ep)
    it = ds.get_episode_iterator(
        max_scene_repeat_steps=max_steps, shuffle=False, step_repetition_range=0.0
    )
    expected = sorted(ds.episodes, key=lambda e: e.scene_id)

    assert next(it).episode_id == expected.pop(0).episode_id
    for _ in range(max_steps):
        it.step_taken()
    # hitting the step budget forces the next pull onto a new scene
    assert next(it).episode_id != expected.pop(0).episode_id

    remaining = list(islice(it, total_ep - 2))
    assert len(remaining) == len(expected)
    # still grouped: each scene id appears as one contiguous run
    assert len({e.scene_id for e in remaining}) == len(
        [k for k, _ in groupby(remaining, key=lambda e: e.scene_id)]
    )


def test_iterator_step_jitter_redraws_quota():
    ds = _construct_dataset(100, num_groups=4)
    it = ds.get_episode_iterator(
        max_scene_repeat_steps=100, step_repetition_range=0.2, seed=3
    )
    quotas = set()
    for _ in range(20):
        next(it)
        quotas.add(it._step_quota)
        for _ in range(it._step_quota):
            it.step_taken()
    # jitter draws from [80, 120]; over 20 forced switches we must see variety
    assert len(quotas) > 1
    assert all(80 <= q <= 120 for q in quotas)


def test_preserve_order():
    ds = _construct_dataset(100)
    episodes = sorted(ds.episodes, reverse=True, key=lambda e: e.scene_id)
    ds.episodes = episodes[:]
    it = ds.get_episode_iterator(shuffle=False, cycle=False)
    assert list(it) == episodes


def test_reset_goals_invalidates_path_cache():
    ep = NavigationEpisode(
        episode_id="0",
        scene_id="1",
        start_position=[0, 0, 0],
        start_rotation=[1, 0, 0, 0],
        goals=[NavigationGoal(position=[1, 2, 3])],
    )
    ep._shortest_path_cache = "dummy"
    assert ep._shortest_path_cache is not None
    ep.goals = [NavigationGoal(position=[3, 4, 5])]
    assert ep._shortest_path_cache is None
