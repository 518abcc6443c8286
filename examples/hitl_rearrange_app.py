"""HITL rearrange app: a human drives the robot through a pick-and-place
episode with the keyboard while keyframes carry full object/grasp state
(reference examples/hitl/rearrange/ rearrange.py — the canonical habitat-hitl
sample app).

Keys: w = forward, a/d = turn, space = grab/release, q = quit.
Headless demo mode (no stdin): a scripted key feed drives one pick.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from habitat_tpu.hitl.app_states import AppState
from habitat_tpu.hitl.hitl_main import HitlDriver, make_keyframe


class AppStateRearrange(AppState):
    """Keyboard -> rearrange env actions + HUD text (reference
    AppStateRearrange in examples/hitl/rearrange/rearrange.py)."""

    def __init__(self, service=None):
        self.service = service
        self._status = ""

    def bind(self, service):
        self.service = service

    def on_environment_reset(self, episode_recorder_dict):
        self._status = "episode start"

    def sim_update(self, dt, post):
        gui = self.service.gui_input
        action = 0  # A_STOP semantics are ignored by 'empty' task
        if gui.get_key("w"):
            action = 1
        elif gui.get_key("a"):
            action = 2
        elif gui.get_key("d"):
            action = 3
        if gui.get_key_down("space"):
            action = 4  # grab/release
        if gui.get_key_down("q"):
            post["application_exit"] = True
        post["action"] = np.array([action], np.int32)
        td = self.service.text_drawer
        td.clear()
        td.add_text(f"status: {self._status}")


def main(max_steps: int = 60, record: bool = False):
    import jax

    from habitat_tpu.tasks.rearrange.generator import make_rearrange_env

    env = make_rearrange_env(
        num_envs=1,
        task="empty",
        with_visual=record,
        render_size=(128, 128) if record else None,
        n_rooms_per_axis=1,
        n_clutter=0,
        seed=0,
        grasp_distance=100.0,  # demo-friendly grab radius
    )

    # thin host adapter: HitlDriver drives a 1-env batched rearrange env
    class EnvAdapter:
        def __init__(self, env):
            self.env = env
            self._state = None

        def reset(self):
            self._state, obs = self.env.reset_fn(jax.random.PRNGKey(0))
            return {k: np.asarray(v[0]) for k, v in obs.items()}

        def step(self, action):
            self._state, obs, r, d, info = self.env.step_fn(
                self._state, np.asarray(action)
            )
            return {k: np.asarray(v[0]) for k, v in obs.items()}

    app = AppStateRearrange()
    adapter = EnvAdapter(env)
    driver = HitlDriver(app, env=adapter, record_video=record, target_sps=1000.0)
    app.bind(driver.service)

    # headless scripted session: walk forward, grab, turn, release
    script = ["w"] * 10 + ["space"] + ["a"] * 6 + ["w"] * 6 + ["space"]
    driver.reset()
    for i in range(min(max_steps, len(script))):
        driver.gui_input.press(script[i])
        driver.step(1.0 / 30)
        driver.gui_input.release(script[i])

    kf = driver.keyframes[-1]
    held_at_some_point = any(k.get("held_object", -1) >= 0 for k in driver.keyframes)
    print("steps:", len(driver.keyframes))
    print("final keyframe keys:", sorted(kf.keys()))
    print("objects in keyframe:", len(kf.get("objects", [])))
    print("held during session:", held_at_some_point)
    return driver


if __name__ == "__main__":
    main()
