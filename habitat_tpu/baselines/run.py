"""CLI entry point (counterpart of habitat-baselines/habitat_baselines/run.py).

Usage:
    python -m habitat_tpu.baselines.run --config-name=pointnav/ppo_pointnav_example \
        habitat_baselines.total_num_steps=1e5 [habitat_baselines.evaluate=true]
"""

from __future__ import annotations

import argparse
import random
import sys
from typing import List, Optional

import numpy as np

from habitat_tpu.config.default import get_config, read_write
from habitat_tpu.core.logging import logger


def execute_exp(config, run_type: str):
    """reference run.py:34."""
    seed = int(config.habitat.get("seed", 100))
    random.seed(seed)
    np.random.seed(seed)

    from habitat_tpu.core.construct import trainer_from_config

    trainer = trainer_from_config(config)
    if run_type == "train":
        return trainer.train(seed=seed)
    elif run_type == "eval":
        from habitat_tpu.baselines.evaluator import evaluate_from_config

        return evaluate_from_config(config, trainer)
    raise ValueError(run_type)


def main(argv: Optional[List[str]] = None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--config-name",
        "--exp-config",
        dest="config_name",
        required=True,
        help="experiment config (e.g. pointnav/ppo_pointnav_example)",
    )
    parser.add_argument(
        "--run-type", choices=["train", "eval"], default="train"
    )
    parser.add_argument(
        "overrides", nargs="*", help="dotted overrides a.b.c=value"
    )
    args = parser.parse_args(argv)

    name = args.config_name
    if not name.endswith(".yaml"):
        name += ".yaml"
    config = get_config(name, args.overrides)
    run_type = args.run_type
    if config.get_path("habitat_baselines.evaluate", False):
        run_type = "eval"
    metrics = execute_exp(config, run_type)
    logger.info(f"done: {metrics}")


if __name__ == "__main__":
    main()
