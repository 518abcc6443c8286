"""make_dataset (reference habitat/datasets/registration.py)."""

from __future__ import annotations

from typing import Optional

from habitat_tpu.core.dataset import Dataset
from habitat_tpu.core.registry import registry

import habitat_tpu.datasets.pointnav  # noqa: F401 — populate registry


def make_dataset(id_dataset: str, **kwargs) -> Dataset:
    _dataset = registry.get_dataset(id_dataset)
    assert _dataset is not None, f"Could not find dataset {id_dataset}"
    return _dataset(**kwargs)
