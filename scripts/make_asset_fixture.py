"""Build the checked-in reference-layout asset fixture (VERDICT r4 #7):
a tiny scene in habitat's exact on-disk format —
  tests/assets/mini_dataset/mini.scene_dataset_config.json
  tests/assets/mini_dataset/stages/mini_room_0.glb
  tests/assets/mini_dataset/pointnav/v1/val/val.json.gz
so a PointNav-v1 dataset flows episodes -> scene_dataset_config -> GLB ->
ScenePack without any procedural shortcut (reference layout:
datasets/pointnav/pointnav_dataset.py:30-80 + habitat_simulator.py:299-331).
Deterministic; rerun to regenerate."""
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax  # noqa: F401  (loaders import jnp)

from habitat_tpu.sims.procedural import generate_apartment
from habitat_tpu.sims.loaders import save_scene_glb, load_scene
from habitat_tpu.datasets.pointnav import generate_pointnav_episode

ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tests", "assets", "mini_dataset")


def main():
    os.makedirs(os.path.join(ROOT, "stages"), exist_ok=True)
    os.makedirs(os.path.join(ROOT, "pointnav", "v1", "val", "content"),
                exist_ok=True)
    scene = generate_apartment(seed=3, extent=8.0, n_rooms_per_axis=2,
                               n_clutter=4, scene_id="mini_room_0")
    glb = os.path.join(ROOT, "stages", "mini_room_0.glb")
    save_scene_glb(scene, glb)
    cfg = {
        "stages": {"paths": {".glb": ["stages/*.glb"]}},
        "objects": {"paths": {".object_config.json": []}},
        "default_attributes": {},
    }
    with open(os.path.join(ROOT, "mini.scene_dataset_config.json"), "w") as f:
        json.dump(cfg, f, indent=2)
    # episodes in the reference schema, scene_id habitat-style
    loaded = load_scene(glb)
    rng = np.random.default_rng(7)
    eps = []
    for i in range(8):
        pair = generate_pointnav_episode(loaded, str(i), rng)
        if pair is None:
            continue
        e = pair[0]
        eps.append({
            "episode_id": e.episode_id,
            "scene_id": "mini_dataset/stages/mini_room_0.glb",
            "start_position": list(map(float, e.start_position)),
            "start_rotation": list(map(float, e.start_rotation)),
            "info": e.info,
            "goals": [{"position": list(map(float, g.position)),
                       "radius": g.radius} for g in e.goals],
        })
    out = os.path.join(ROOT, "pointnav", "v1", "val", "val.json.gz")
    with gzip.open(out, "wt") as f:
        json.dump({"episodes": eps}, f)
    print("fixture:", ROOT, "episodes:", len(eps),
          "glb KB:", round(os.path.getsize(glb) / 1024, 1))


if __name__ == "__main__":
    main()
