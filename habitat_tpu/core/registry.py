"""Global component registry.

TPU-native re-implementation of the reference's decorator registry
(habitat-lab/habitat/core/registry.py:43): string-named component maps that let
YAML ``type:`` fields resolve to classes/functions.  We keep the same registration
kinds (task / simulator / sensor / measure / task_action / dataset / env) and add
the habitat-baselines kinds (trainer / policy / obs_transformer / storage /
updater / auxiliary loss) that the reference keeps in a second registry
(habitat-baselines/habitat_baselines/common/baseline_registry.py:28).

Unlike the reference, registered sensors/measures/actions here are *functional*
components: classes whose instances expose pure functions suitable for jit/vmap.
"""

from __future__ import annotations

import collections
from typing import Any, Callable, DefaultDict, Dict, Optional, Type


class _Singleton(type):
    _instances: Dict[type, Any] = {}

    def __call__(cls, *args, **kwargs):
        if cls not in cls._instances:
            cls._instances[cls] = super().__call__(*args, **kwargs)
        return cls._instances[cls]


class Registry(metaclass=_Singleton):
    mapping: DefaultDict[str, Dict[str, Any]] = collections.defaultdict(dict)

    @classmethod
    def _register_impl(
        cls,
        _type: str,
        to_register: Optional[Any],
        name: Optional[str],
        assert_type: Optional[type] = None,
    ) -> Callable:
        def wrap(to_register):
            if assert_type is not None:
                assert issubclass(
                    to_register, assert_type
                ), f"{to_register} must be a subclass of {assert_type}"
            register_name = to_register.__name__ if name is None else name
            cls.mapping[_type][register_name] = to_register
            return to_register

        if to_register is None:
            return wrap
        return wrap(to_register)

    # -- habitat-lab kinds (reference core/registry.py:72-196) ------------
    @classmethod
    def register_task(cls, to_register=None, *, name: Optional[str] = None):
        return cls._register_impl("task", to_register, name)

    @classmethod
    def register_simulator(cls, to_register=None, *, name: Optional[str] = None):
        return cls._register_impl("sim", to_register, name)

    @classmethod
    def register_sensor(cls, to_register=None, *, name: Optional[str] = None):
        return cls._register_impl("sensor", to_register, name)

    @classmethod
    def register_measure(cls, to_register=None, *, name: Optional[str] = None):
        return cls._register_impl("measure", to_register, name)

    @classmethod
    def register_task_action(cls, to_register=None, *, name: Optional[str] = None):
        return cls._register_impl("task_action", to_register, name)

    @classmethod
    def register_dataset(cls, to_register=None, *, name: Optional[str] = None):
        return cls._register_impl("dataset", to_register, name)

    @classmethod
    def register_env(cls, to_register=None, *, name: Optional[str] = None):
        return cls._register_impl("env", to_register, name)

    @classmethod
    def register_action_space_configuration(
        cls, to_register=None, *, name: Optional[str] = None
    ):
        return cls._register_impl("asc", to_register, name)

    # -- habitat-baselines kinds (reference baseline_registry.py:28-193) --
    @classmethod
    def register_trainer(cls, to_register=None, *, name: Optional[str] = None):
        return cls._register_impl("trainer", to_register, name)

    @classmethod
    def register_policy(cls, to_register=None, *, name: Optional[str] = None):
        return cls._register_impl("policy", to_register, name)

    @classmethod
    def register_obs_transformer(cls, to_register=None, *, name: Optional[str] = None):
        return cls._register_impl("obs_transformer", to_register, name)

    @classmethod
    def register_storage(cls, to_register=None, *, name: Optional[str] = None):
        return cls._register_impl("storage", to_register, name)

    @classmethod
    def register_updater(cls, to_register=None, *, name: Optional[str] = None):
        return cls._register_impl("updater", to_register, name)

    @classmethod
    def register_auxiliary_loss(cls, to_register=None, *, name: Optional[str] = None):
        return cls._register_impl("aux_loss", to_register, name)

    @classmethod
    def register_agent_access_mgr(cls, to_register=None, *, name: Optional[str] = None):
        return cls._register_impl("agent_access_mgr", to_register, name)

    @classmethod
    def register_episode_generator(cls, to_register=None, *, name: Optional[str] = None):
        return cls._register_impl("episode_generator", to_register, name)

    # -- getters -----------------------------------------------------------
    @classmethod
    def _get_impl(cls, _type: str, name: str) -> Any:
        out = cls.mapping[_type].get(name)
        if out is None:
            raise KeyError(
                f"No {_type} registered under name {name!r}. "
                f"Available: {sorted(cls.mapping[_type])}"
            )
        return out

    @classmethod
    def get_task(cls, name: str):
        return cls._get_impl("task", name)

    @classmethod
    def get_simulator(cls, name: str):
        return cls._get_impl("sim", name)

    @classmethod
    def get_sensor(cls, name: str):
        return cls._get_impl("sensor", name)

    @classmethod
    def get_measure(cls, name: str):
        return cls._get_impl("measure", name)

    @classmethod
    def get_task_action(cls, name: str):
        return cls._get_impl("task_action", name)

    @classmethod
    def get_dataset(cls, name: str):
        return cls._get_impl("dataset", name)

    @classmethod
    def get_env(cls, name: str):
        return cls._get_impl("env", name)

    @classmethod
    def get_trainer(cls, name: str):
        return cls._get_impl("trainer", name)

    @classmethod
    def get_policy(cls, name: str):
        return cls._get_impl("policy", name)

    @classmethod
    def get_obs_transformer(cls, name: str):
        return cls._get_impl("obs_transformer", name)

    @classmethod
    def get_storage(cls, name: str):
        return cls._get_impl("storage", name)

    @classmethod
    def get_updater(cls, name: str):
        return cls._get_impl("updater", name)

    @classmethod
    def get_auxiliary_loss(cls, name: str):
        return cls._get_impl("aux_loss", name)

    @classmethod
    def get_agent_access_mgr(cls, name: str):
        return cls._get_impl("agent_access_mgr", name)

    @classmethod
    def get_episode_generator(cls, name: str):
        return cls._get_impl("episode_generator", name)

    @classmethod
    def names(cls, _type: str):
        return sorted(cls.mapping[_type])


registry = Registry()

# Alias matching habitat-baselines' import surface.
baseline_registry = registry
