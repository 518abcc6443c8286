

def test_largest_island_mask():
    import numpy as np
    from habitat_tpu.sims.scene import largest_island_mask

    occ = np.zeros((8, 8), bool)
    occ[1:3, 1:3] = True      # small island (4 cells)
    occ[4:8, 4:8] = True      # big island (16 cells)
    m = largest_island_mask(occ)
    assert m.sum() == 16
    assert m[5, 5] and not m[1, 1]


def test_dynamic_object_blocks_base():
    """Navgrid-recompute semantics: a placed object blocks the agent's base
    (reference recomputes the navmesh when objects move,
    rearrange_sim.py:465-492)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from habitat_tpu.tasks.rearrange.generator import make_rearrange_env

    env = make_rearrange_env(
        num_envs=1, task="empty", with_visual=False, seed=4,
        n_rooms_per_axis=1, n_clutter=0,
    )
    state, obs = env.reset_fn(jax.random.PRNGKey(0))
    # place the target object directly in front of the agent
    fwd = np.asarray(env.table.nav.start_yaw[state.ep_idx])
    dirn = np.stack([-np.sin(fwd), np.zeros_like(fwd), -np.cos(fwd)], -1)
    obj_pos = np.asarray(state.pos) + dirn * 0.45
    import dataclasses as dc

    state = dc.replace(
        state, obj_pos=jnp.asarray(obj_pos)[:, None, :].repeat(env.num_objects, 1)
    )
    p0 = np.asarray(state.pos).copy()
    a = jnp.ones((1,), jnp.int32)  # forward
    state, obs, r, d, info = env.step_fn(state, a)
    moved = np.linalg.norm(np.asarray(state.pos) - p0)
    assert moved < 0.05, moved  # blocked by the object disc
    assert bool(np.asarray(state.collided)[0])
