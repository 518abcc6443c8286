"""HITL driver tests (reference habitat-hitl/test)."""

import numpy as np

from habitat_tpu.hitl.app_states import AppState
from habitat_tpu.hitl.hitl_main import HitlDriver


class SpinApp(AppState):
    """Turns left when 'a' held, forward otherwise; exits after 10 updates."""

    def __init__(self):
        self.updates = 0
        self.resets = 0

    def on_environment_reset(self, _):
        self.resets += 1

    def sim_update(self, dt, post):
        self.updates += 1
        post["action"] = "turn_left" if self.updates % 2 else "move_forward"
        if self.updates >= 10:
            post["application_exit"] = True


def test_hitl_driver_loop(tmp_path):
    app = SpinApp()
    driver = HitlDriver(app, target_sps=1000.0)
    driver.run(max_steps=20)
    assert app.resets == 1
    assert app.updates == 10
    assert len(driver.keyframes) == 10
    kf = driver.keyframes[0]
    assert "agent" in kf and len(kf["agent"]["position"]) == 3
    driver.export_keyframes(str(tmp_path / "kf.json"))
    driver.save_video(str(tmp_path), "session")
    import os
    assert os.path.exists(tmp_path / "kf.json")


def test_gui_input():
    from habitat_tpu.hitl.app_states import GuiInput

    gi = GuiInput()
    gi.press("W")
    assert gi.get_key("w") and gi.get_key_down("w")
    gi.on_frame_end()
    assert gi.get_key("w") and not gi.get_key_down("w")
    gi.release("w")
    assert not gi.get_key("w")


def test_hitl_minimal_example_app():
    import importlib.util, os
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "examples", "hitl_minimal_app.py")
    spec = importlib.util.spec_from_file_location("hitl_minimal_app", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    driver = mod.main(max_steps=8)
    assert driver._step >= 1
    assert len(driver.keyframes) == driver._step
