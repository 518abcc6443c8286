"""Functional task framework: sensors, measures, actions as pure functions.

TPU-native redesign of the reference's EmbodiedTask / Measure / Measurements
machinery (habitat-lab/habitat/core/embodied_task.py: Measure:83, Metrics:129,
Measurements:144, check_measure_dependencies:184, EmbodiedTask:233,
_init_entities:275). The reference instantiates stateful objects per env
process and calls them step-by-step in Python; here every component is a pure
function over a batched ``StepContext``, composed once at build time into a
single jitted step. Measure state lives in the env-state pytree, so metric
updates for N envs are one fused array program.

Registered names match the reference registry so YAML configs resolve
identically.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
from gymnasium import Space

from habitat_tpu.core.dataset import EpisodeTable
from habitat_tpu.sims.scene import ScenePack


@dataclasses.dataclass
class StepContext:
    """Everything a sensor/measure can see at one step, batched over N envs.

    Counterpart of the (episode, task, observations) kwargs threaded through
    reference Sensor.get_observation / Measure.update_metric.
    """

    pack: ScenePack
    table: EpisodeTable
    ep_idx: jnp.ndarray  # (N,)
    sid: jnp.ndarray  # (N,) scene index
    pos: jnp.ndarray  # (N,3)
    yaw: jnp.ndarray  # (N,)
    pitch: jnp.ndarray  # (N,)
    prev_pos: jnp.ndarray  # (N,3)
    start_pos: jnp.ndarray  # (N,3) — episode start
    start_yaw: jnp.ndarray  # (N,)
    step: jnp.ndarray  # (N,) int32 — steps taken this episode
    action: jnp.ndarray  # (N,) int32 — action just taken (-1 at reset)
    stop_called: jnp.ndarray  # (N,) bool
    collided: jnp.ndarray  # (N,) bool — this step
    collision_count: jnp.ndarray  # (N,) int32 — cumulative
    rng: jnp.ndarray  # (N,2) uint32 per-env fold-in keys

    @property
    def goal_pos(self) -> jnp.ndarray:
        """(N,G,3) current episode goal positions."""
        return self.table.goal_pos[self.ep_idx]

    @property
    def goal_valid(self) -> jnp.ndarray:
        return self.table.goal_valid[self.ep_idx]

    @property
    def geodesic_start(self) -> jnp.ndarray:
        return self.table.geodesic_start[self.ep_idx]


class FunctionalSensor:
    """A sensor = uuid + observation_space + pure batched compute(ctx)."""

    uuid: str = ""

    def __init__(self, config: Any = None):
        self.config = config

    def observation_space(self) -> Space:
        raise NotImplementedError

    def compute(self, ctx: StepContext) -> jnp.ndarray:
        """Return (N, ...) batched observation."""
        raise NotImplementedError


class FunctionalMeasure:
    """A measure = uuid + deps + pure batched state machine.

    ``reset(ctx)`` -> (state, value); ``update(state, ctx, measures)`` ->
    (state, value), where ``measures`` maps dep uuid -> already-updated value
    this step (the reference's declared-dependency ordering,
    embodied_task.py:184).
    """

    uuid: str = ""
    deps: Tuple[str, ...] = ()

    def __init__(self, config: Any = None):
        self.config = config

    def reset(self, ctx: StepContext):
        raise NotImplementedError

    def update(self, state, ctx: StepContext, measures: Dict[str, jnp.ndarray]):
        raise NotImplementedError


class FunctionalAction:
    """A discrete task action compiled into the step's pose-update tables.

    Nav-style actions reduce to (forward_amount, turn_amount, tilt_amount,
    stop_flag); richer actions (teleport, velocity control, arm control)
    override ``apply`` instead.
    """

    name: str = ""

    def __init__(self, config: Any = None):
        self.config = config

    # simple parametrization — used to build fused per-action tables
    def move_amount(self) -> float:
        return 0.0

    def turn_amount(self) -> float:
        return 0.0

    def tilt_amount(self) -> float:
        return 0.0

    def is_stop(self) -> bool:
        return False


def order_measures(measures: Sequence[FunctionalMeasure]) -> Tuple[FunctionalMeasure, ...]:
    """Topological sort by declared deps (reference
    Measurements.check_measure_dependencies, embodied_task.py:184)."""
    by_uuid = {m.uuid: m for m in measures}
    for m in measures:
        for d in m.deps:
            if d not in by_uuid:
                raise ValueError(
                    f"Measure {m.uuid!r} requires dependency {d!r} which is not "
                    f"among the enabled measures {sorted(by_uuid)}"
                )
    ordered = []
    visited: Dict[str, int] = {}

    def visit(uuid: str):
        st = visited.get(uuid, 0)
        if st == 1:
            raise ValueError(f"Measure dependency cycle at {uuid!r}")
        if st == 2:
            return
        visited[uuid] = 1
        for d in by_uuid[uuid].deps:
            visit(d)
        visited[uuid] = 2
        ordered.append(by_uuid[uuid])

    for m in measures:
        visit(m.uuid)
    return tuple(ordered)


class Metrics(dict):
    """Flat dict of measure values (reference embodied_task.py:129)."""
