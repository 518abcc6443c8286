"""Flatten metric dicts to scalars (reference habitat-baselines/
habitat_baselines/utils/info_dict.py extract_scalars_from_info)."""

from __future__ import annotations

import numbers
from typing import Any, Dict, List


NON_SCALAR_METRICS = {"top_down_map", "collisions.is_collision"}


def extract_scalars_from_info(info: Dict[str, Any]) -> Dict[str, float]:
    result: Dict[str, float] = {}
    for k, v in info.items():
        if not isinstance(k, str) or k in NON_SCALAR_METRICS:
            continue
        if isinstance(v, dict):
            result.update(
                {
                    k + "." + subk: subv
                    for subk, subv in extract_scalars_from_info(v).items()
                    if isinstance(subk, str) and k + "." + subk not in NON_SCALAR_METRICS
                }
            )
        elif isinstance(v, numbers.Number):
            result[k] = float(v)
        else:
            try:
                import numpy as np

                arr = np.asarray(v)
                if arr.size == 1:
                    result[k] = float(arr)
            except Exception:
                pass
    return result


def extract_scalars_from_infos(infos: List[Dict[str, Any]]) -> Dict[str, List[float]]:
    results: Dict[str, List[float]] = {}
    for i in range(len(infos)):
        for k, v in extract_scalars_from_info(infos[i]).items():
            results.setdefault(k, []).append(v)
    return results
