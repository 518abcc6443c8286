"""Interactive arm-control play tool (reference examples/interactive_play.py
— keyboard teleop of the full ArmAction composite: per-joint deltas, base
velocity, grip, with optional on-screen render).

Keys (reference key map, interactive_play.py get_input_vel_ctlr):
  w/s       base forward / back
  a/d       base turn left / right
  1..7      select arm joint            q/e  move selected joint - / +
  space     toggle grip (suction grasp)
  r         reset episode               x    quit

Headless demo mode (no TTY): a scripted sequence raises joints, drives the
base, and toggles the grip — used by tests/test_examples.py to exercise the
whole arm-control play path.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_env(num_envs: int = 1, with_visual: bool = False):
    """Continuous arm env: action = [joint deltas (7), grip, base lin, base
    ang] (reference ArmAction composite, tasks/rearrange/actions/actions.py)."""
    from habitat_tpu.tasks.rearrange.generator import make_rearrange_env

    return make_rearrange_env(
        num_envs=num_envs,
        task="pick",
        with_visual=with_visual,
        control="arm",
        n_rooms_per_axis=1,
        n_clutter=0,
        seed=0,
    )


class PlaySession:
    """Maps key state -> one env action per frame and steps the env."""

    def __init__(self, env):
        import jax

        self.env = env
        self.n_joints = env.n_joints
        self.state, self.obs = env.reset_fn(jax.random.PRNGKey(0))
        self.selected_joint = 0
        self.grip = -1.0
        self.frames = 0

    def action_from_keys(self, keys) -> np.ndarray:
        a = np.zeros((self.env.num_envs, self.n_joints + 3), np.float32)
        for k in keys:
            if k in "1234567":
                self.selected_joint = min(int(k) - 1, self.n_joints - 1)
            elif k == "q":
                a[:, self.selected_joint] = -1.0
            elif k == "e":
                a[:, self.selected_joint] = 1.0
            elif k == "w":
                a[:, self.n_joints + 1] = 1.0  # base lin
            elif k == "s":
                a[:, self.n_joints + 1] = -1.0
            elif k == "a":
                a[:, self.n_joints + 2] = 1.0  # base ang
            elif k == "d":
                a[:, self.n_joints + 2] = -1.0
            elif k == " ":
                self.grip = -self.grip
        a[:, self.n_joints] = self.grip
        return a

    def step(self, keys) -> dict:
        import jax.numpy as jnp

        a = self.action_from_keys(keys)
        self.state, self.obs, r, d, info = self.env.step_fn(
            self.state, jnp.asarray(a)
        )
        self.frames += 1
        return info

    def status(self) -> str:
        j = np.asarray(self.obs["joint"][0])
        ee = np.asarray(self.obs["ee_pos"][0])
        hold = float(np.asarray(self.obs["is_holding"][0, 0]))
        return (
            f"frame {self.frames} joint[{self.selected_joint}] "
            f"q={j[self.selected_joint]:+.2f} ee=({ee[0]:+.2f},{ee[1]:+.2f},"
            f"{ee[2]:+.2f}) grip={'ON' if hold > 0 else 'off'}"
        )


SCRIPTED = (
    ["w"] * 5 + ["1", "e"] * 4 + ["3", "e"] * 4 + [" "] + ["w"] * 3
    + [" "] + ["a"] * 3
)


def main(max_steps: int = 0, interactive: bool | None = None):
    env = build_env()
    sess = PlaySession(env)
    if interactive is None:
        interactive = sys.stdin.isatty() and max_steps == 0
    if not interactive:
        steps = SCRIPTED if max_steps == 0 else SCRIPTED[:max_steps]
        for keys in steps:
            sess.step([keys])
        print(sess.status())
        return sess
    # TTY mode: raw single-key reads (no GL window in this image — status
    # line only; the reference uses pygame for the same loop)
    import termios
    import tty

    fd = sys.stdin.fileno()
    old = termios.tcgetattr(fd)
    try:
        tty.setcbreak(fd)
        while True:
            k = sys.stdin.read(1)
            if k == "x":
                break
            if k == "r":
                import jax

                sess.state, sess.obs = env.reset_fn(jax.random.PRNGKey(0))
                continue
            sess.step([k])
            print("\r" + sess.status(), end="", flush=True)
    finally:
        termios.tcsetattr(fd, termios.TCSADRAIN, old)
    return sess


if __name__ == "__main__":
    main()
