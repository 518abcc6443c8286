"""PPO/DD-PPO trainer: host loop, sharding, checkpoints, logging, resume.

Counterpart of the reference trainer stack (SURVEY §3.1):
- BaseTrainer/BaseRLTrainer skeleton (common/base_trainer.py:34-338:
  percent_done/should_checkpoint :254-287, resume predicate :289)
- PPOTrainer.train (rl/ppo/ppo_trainer.py:656): init → loop → checkpoint
- checkpoint scheme: numbered ckpt.N + latest + hidden resume state
  (ppo_trainer.py:294-328, ddp_utils.py:182-224) — implemented with orbax.
- windowed episode stats all-reduced across ranks (:524-557) — here the stats
  are device-side sums carried in the train step's metrics; the host keeps the
  window.

The compute path is ONE jitted ``PPOLearner.train_step`` over a ``data`` mesh:
'ppo' (single device) and 'ddppo' (all devices) are the same program.
"""

from __future__ import annotations

import dataclasses
import json
import os
import signal
import time
from collections import defaultdict, deque
from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from habitat_tpu.baselines.ppo import PPOConfig, PPOLearner, TrainState
from habitat_tpu.core.batched_env import BatchedEnv
from habitat_tpu.core.logging import logger
from habitat_tpu.core.registry import registry
from habitat_tpu.models.policy import ActorCritic
from habitat_tpu.parallel import mesh as meshlib


@dataclasses.dataclass
class TrainerConfig:
    """Run-level knobs (reference HabitatBaselinesConfig fields)."""

    total_num_steps: float = 1e6
    checkpoint_folder: str = "data/checkpoints"
    tensorboard_dir: str = ""
    num_checkpoints: int = 10
    checkpoint_interval: int = -1
    log_interval: int = 10
    reward_window_size: int = 50
    use_mesh: bool = True  # shard envs over all local devices ('ddppo')
    verbose: bool = True


class EarlyStopper:
    """Preemption signals → clean exit with resume state (reference
    add_signal_handlers, ddp_utils.py:36-41,163-179): SIGTERM/SIGUSR2 map to
    EXIT/SAVE_STATE (save ``.resume_state`` and stop); SIGUSR1 is the SLURM
    preemption notice and additionally REQUEUES the job so the scheduler
    restarts it (reference requeue_job, ddp_utils.py:227-240)."""

    def __init__(self):
        self.should_exit = False
        self.should_requeue = False
        for sig in (signal.SIGTERM, signal.SIGUSR2):
            try:
                signal.signal(sig, self._handler)
            except ValueError:
                pass  # non-main thread
        try:
            signal.signal(signal.SIGUSR1, self._requeue_handler)
        except ValueError:
            pass

    def _handler(self, signum, frame):
        self.should_exit = True

    def _requeue_handler(self, signum, frame):
        self.should_exit = True
        self.should_requeue = True


def requeue_job() -> bool:
    """Ask SLURM to requeue this job after preemption (reference
    ddp_utils.requeue_job:227 — rank0-only ``scontrol requeue $SLURM_JOB_ID``).
    Returns True if a requeue was issued; no-op outside SLURM."""
    job_id = os.environ.get("SLURM_JOB_ID")
    if not job_id or not meshlib.rank0_only():
        return False
    import subprocess

    logger.info(f"requeueing SLURM job {job_id}")
    subprocess.check_call(["scontrol", "requeue", job_id])
    return True


@registry.register_trainer(name="ppo")
@registry.register_trainer(name="ddppo")
class PPOTrainer:
    def __init__(
        self,
        env: BatchedEnv,
        policy: ActorCritic,
        ppo_cfg: PPOConfig = PPOConfig(),
        run_cfg: TrainerConfig = TrainerConfig(),
        measure_keys: Tuple[str, ...] = ("success", "spl", "distance_to_goal"),
    ):
        self.env = env
        self.policy = policy
        self.ppo_cfg = ppo_cfg
        self.run_cfg = run_cfg
        # Box action space -> gaussian head (reference auto-selects
        # action_distribution_type from the action space)
        action_type = (
            "gaussian"
            if hasattr(env.action_space, "shape")
            and not hasattr(env.action_space, "n")
            else "categorical"
        )
        self.learner = PPOLearner(
            env, policy, ppo_cfg, measure_keys=measure_keys,
            action_type=action_type,
        )
        self.mesh = (
            meshlib.make_mesh() if run_cfg.use_mesh and len(jax.devices()) > 1 else None
        )
        self._env_data = getattr(env, "env_data", None)
        from habitat_tpu.parallel.compile_opts import tpu_compiler_options

        self._train_step = jax.jit(
            lambda ts, data: self.learner.train_step(ts, data),
            donate_argnums=(0,),
            compiler_options=tpu_compiler_options(),
        )
        self._init = jax.jit(lambda key, data: self.learner.init_fn(key, data))
        self.num_steps_done = 0
        self.num_updates_done = 0
        self._windows: Dict[str, deque] = defaultdict(
            lambda: deque(maxlen=run_cfg.reward_window_size)
        )
        self._ckpt_count = 0

    # -- checkpointing (orbax; reference two-tier scheme §5.4) ----------
    def _ckpt_dir(self) -> str:
        d = os.path.abspath(self.run_cfg.checkpoint_folder)
        os.makedirs(d, exist_ok=True)
        return d

    def save_checkpoint(self, ts: TrainState, name: str) -> None:
        import orbax.checkpoint as ocp

        path = os.path.join(self._ckpt_dir(), name)
        ckptr = ocp.StandardCheckpointer()
        host_ts = jax.tree.map(np.asarray, ts)
        ckptr.save(path, host_ts, force=True)
        ckptr.wait_until_finished()
        meta = {
            "num_steps_done": self.num_steps_done,
            "num_updates_done": self.num_updates_done,
            "ckpt_count": self._ckpt_count,
        }
        with open(os.path.join(self._ckpt_dir(), name + ".meta.json"), "w") as f:
            json.dump(meta, f)

    def load_checkpoint(self, name: str, ts_like: TrainState) -> TrainState:
        import dataclasses as _dc

        import orbax.checkpoint as ocp

        path = os.path.join(self._ckpt_dir(), name)
        ckptr = ocp.StandardCheckpointer()
        try:
            restored = ckptr.restore(path, ts_like)
        except ValueError:
            # env-count mismatch (e.g. eval with fewer envs than training —
            # reference evals restore model weights only, ppo_trainer
            # _eval_checkpoint): restore at the STORED shapes via metadata,
            # then take params/opt_state and keep the live env shapes
            meta = ckptr.metadata(path).item_metadata
            abstract = jax.tree.map(
                lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype), meta
            )
            full = ckptr.restore(path, abstract)
            get = (
                (lambda tree, k: tree[k])
                if isinstance(full, dict)
                else (lambda tree, k: getattr(tree, k))
            )
            restored = ts_like._replace(
                params=get(full, "params"), opt_state=get(full, "opt_state")
            )
        meta_path = os.path.join(self._ckpt_dir(), name + ".meta.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            self.num_steps_done = meta["num_steps_done"]
            self.num_updates_done = meta["num_updates_done"]
            self._ckpt_count = meta.get("ckpt_count", 0)
        return restored

    def resume_state_exists(self) -> bool:
        return os.path.exists(os.path.join(self._ckpt_dir(), ".resume_state"))

    # -- progress (reference base_trainer.py:254-287) -------------------
    def percent_done(self) -> float:
        return self.num_steps_done / self.run_cfg.total_num_steps

    def is_done(self) -> bool:
        return self.percent_done() >= 1.0

    def should_checkpoint(self) -> bool:
        rc = self.run_cfg
        if rc.checkpoint_interval == -1:
            target = self._ckpt_count * (1 / rc.num_checkpoints)
            return self.percent_done() >= target
        return self.num_updates_done % rc.checkpoint_interval == 0

    # -- training --------------------------------------------------------
    def _place(self, ts: TrainState) -> TrainState:
        if self.mesh is None:
            return ts
        n = self.env.num_envs
        sharded_env = meshlib.shard_env_pytree(ts.env_state, self.mesh, n)
        sharded_obs = meshlib.shard_env_pytree(ts.obs, self.mesh, n)
        rep = lambda t: meshlib.replicate_pytree(t, self.mesh)
        return ts._replace(
            params=rep(ts.params),
            opt_state=rep(ts.opt_state),
            env_state=sharded_env,
            obs=sharded_obs,
            hidden=meshlib.shard_env_pytree(ts.hidden, self.mesh, n),
            prev_action=meshlib.shard_env_pytree(ts.prev_action, self.mesh, n),
            not_done=meshlib.shard_env_pytree(ts.not_done, self.mesh, n),
            key=rep(ts.key),
            update_idx=rep(ts.update_idx),
            ep_return_acc=meshlib.shard_env_pytree(ts.ep_return_acc, self.mesh, n),
            ep_len_acc=meshlib.shard_env_pytree(ts.ep_len_acc, self.mesh, n),
        )

    def train(self, seed: int = 0, resume: bool = True) -> Dict[str, float]:
        """Main loop (reference ppo_trainer.py:656-801)."""
        rc = self.run_cfg
        stopper = EarlyStopper()
        ts = self._init(jax.random.PRNGKey(seed), self._env_data)
        if resume and self.resume_state_exists():
            ts = self.load_checkpoint(".resume_state", ts)
            logger.info(
                f"resumed at update {self.num_updates_done}, "
                f"steps {self.num_steps_done}"
            )
        ts = self._place(ts)

        writer = None
        if rc.tensorboard_dir:
            from habitat_tpu.utils.tb import TensorboardWriter

            writer = TensorboardWriter(rc.tensorboard_dir)

        steps_per_update = self.ppo_cfg.num_steps * self.env.num_envs
        t_start = time.time()
        last_metrics: Dict[str, float] = {}
        while not self.is_done():
            ts, metrics = self._train_step(ts, self._env_data)
            self.num_updates_done += 1
            self.num_steps_done += steps_per_update

            m = {k: float(v) for k, v in jax.tree.map(np.asarray, metrics).items()}
            dc = max(m.pop("done_count", 0.0), 0.0)
            if dc > 0:
                self._windows["reward"].append(m.pop("reward_sum") / dc)
                self._windows["episode_length"].append(m.pop("len_sum") / dc)
                for k in list(m):
                    if k.startswith("m_"):
                        self._windows[k[2:]].append(m.pop(k) / dc)
            window_means = {
                k: float(np.mean(v)) for k, v in self._windows.items() if len(v)
            }
            last_metrics = {**m, **window_means}

            if self.num_updates_done % rc.log_interval == 0 and rc.verbose:
                fps = self.num_steps_done / (time.time() - t_start)
                logger.info(
                    f"update {self.num_updates_done} steps {self.num_steps_done} "
                    f"fps {fps:.0f} "
                    + " ".join(f"{k}={v:.3f}" for k, v in sorted(last_metrics.items()))
                )
            if writer is not None:
                for k, v in last_metrics.items():
                    writer.add_scalar(
                        k if "/" in k else f"metrics/{k}", v, self.num_steps_done
                    )

            if self.should_checkpoint() and meshlib.rank0_only():
                self.save_checkpoint(ts, f"ckpt.{self._ckpt_count}")
                self.save_checkpoint(ts, "latest")
                self._ckpt_count += 1

            if stopper.should_exit:
                # preemption: save hidden resume state and bail
                # (reference ppo_trainer.py:707-735); on SIGUSR1 also
                # requeue the SLURM job (ddp_utils.py:227-240)
                if meshlib.rank0_only():
                    self.save_checkpoint(ts, ".resume_state")
                if stopper.should_requeue:
                    requeue_job()
                break

        if writer is not None:
            writer.close()
        self._final_ts = ts
        return last_metrics


@registry.register_trainer(name="ver")
class VERTrainer(PPOTrainer):
    """VER trainer name parity (reference rl/ver/ver_trainer.py:66-581).

    The reference's VER exists to overlap env stepping, inference, and
    learning across process pools with shared-memory staging (environment/
    inference/report/preemption-decider workers, SURVEY §3.3) because its
    simulator is host-bound. On TPU the entire pipeline is ONE fused jitted
    step (rollout scan + update) with no host in the loop, so "variable
    experience rollout" collapses into the synchronous trainer: there are no
    stragglers to rebalance (SPMD is lock-step) and no transfer buffers
    (rollouts never leave HBM). The name is kept so ver configs run.
    """
