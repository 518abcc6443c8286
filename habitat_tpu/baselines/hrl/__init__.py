"""HRL: hierarchical policy, skills, high-level policies, HRL-PPO.

Counterpart of habitat-baselines/habitat_baselines/rl/hrl/. High-level
policies: FixedHighLevelPolicy (fixed PDDL plan), NeuralHighLevelPolicy
(hrl_ppo), PlannerHighLevelPolicy (symbolic forward search precomputed into
a 2^P plan table — see planner.py).
"""

from habitat_tpu.baselines.hrl.hierarchical import (  # noqa: F401
    FixedHighLevelPolicy,
    HierarchicalPolicy,
    NnSkill,
    Skill,
    default_rearrange_plan,
)
from habitat_tpu.baselines.hrl.planner import (  # noqa: F401
    PlannerHighLevelPolicy,
    build_plan_table,
)
