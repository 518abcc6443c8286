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
