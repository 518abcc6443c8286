"""Run shipped examples (reference test/test_examples.py pattern)."""

import pytest


def test_example():
    from examples.example import example

    example()


def test_register_new_sensors_and_measures():
    from examples.register_new_sensors_and_measures import main

    main()


def test_new_actions():
    from examples.new_actions import main

    main()


def test_batched_training_example():
    from examples.batched_training_example import main

    main(num_envs=4, updates=3)


def test_shortest_path_follower_example(tmp_path):
    import examples.shortest_path_follower_example as ex

    ex.IMAGE_DIR = str(tmp_path)
    ex.shortest_path_example(max_steps=40, make_video=True)


def test_interactive_play_example():
    """Scripted arm teleop session (reference examples/interactive_play.py):
    joints move, base drives, grip toggles through the ArmAction layout."""
    import importlib.util, os

    import numpy as np

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples", "interactive_play.py",
    )
    spec = importlib.util.spec_from_file_location("interactive_play", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    sess = mod.main(interactive=False)
    assert sess.frames == len(mod.SCRIPTED)
    j = np.asarray(sess.obs["joint"][0])
    assert np.abs(j).max() > 0.05  # arm actually articulated


def test_vln_benchmark_example():
    """Batched reference-path VLN benchmark (reference examples/
    vln_benchmark.py): oracle follower reaches goals with high SPL."""
    import importlib.util, os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples", "vln_benchmark.py",
    )
    spec = importlib.util.spec_from_file_location("vln_benchmark", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    metrics, n = mod.vln_reference_path_benchmark(num_envs=4, episodes_target=8)
    assert n >= 8
    assert metrics["success"] >= 0.8
    assert metrics["spl"] >= 0.5


def test_hitl_basic_viewer_app():
    from examples.hitl_basic_viewer_app import main

    app, driver = main()
    # stepped through all 3 episodes with pause/single-step/orbit input
    assert app.seen_episodes == [0, 1, 2]
    assert len(driver.keyframes) > 30


def test_hitl_rearrange_v2_app_scripted(tmp_path):
    from examples.hitl_rearrange_v2_app import main

    rec = main(output_path=str(tmp_path / "s.json.gz"))
    assert rec["finished"] and len(rec["episodes"]) == 2
    assert len(rec["users"]) == 2


def test_hitl_sim_viewer_example():
    """Free-camera scene viewer with scene cycling (reference
    examples/hitl/sim_viewer)."""
    from examples.hitl_sim_viewer_app import main

    app, rendered = main()
    assert app.frames > 50


def test_hitl_pick_throw_example():
    """VR-hand grab/carry/throw over the contacts stepper (reference
    examples/hitl/pick_throw_vr)."""
    from examples.hitl_pick_throw_app import main

    app = main()
    assert [e[0] for e in app.events] == ["grasp", "throw"]
