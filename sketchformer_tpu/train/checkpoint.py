"""Orbax checkpointing: async sharded save, auto-resume, config snapshot.

Capability parity with the reference's checkpoint layer (reference:
core/models.py — tf.train.Checkpoint + CheckpointManager saving model +
optimizer with periodic keep policy, experiment dir with saved config JSON,
resume by experiment id). TPU-native re-design:

- orbax-checkpoint CheckpointManager with async save (training never blocks
  on HBM->disk) and sharding-aware restore (params restored straight onto
  the mesh via restore_args when one is active);
- the FULL train state is saved: params, opt state, step, PRNG key — plus
  the config JSON next to the checkpoints so a run dir is self-describing;
- preemption-safe: ``save_on_signal`` installs a SIGTERM hook that forces a
  synchronous save before the process dies (SURVEY.md §5 failure-recovery
  row).
"""

from __future__ import annotations

import json
import os
import signal
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from sketchformer_tpu.train.step import TrainState


class CheckpointManager:
    def __init__(
        self,
        run_dir: str,
        max_to_keep: int = 3,
        save_interval_steps: int = 1,
        async_save: bool = True,
    ) -> None:
        self.run_dir = os.path.abspath(run_dir)
        self.ckpt_dir = os.path.join(self.run_dir, "checkpoints")
        os.makedirs(self.ckpt_dir, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            save_interval_steps=save_interval_steps,
            enable_async_checkpointing=async_save,
        )
        self._mgr = ocp.CheckpointManager(self.ckpt_dir, options=options)

    # -- config snapshot ---------------------------------------------------
    def save_config(self, config: Any) -> None:
        path = os.path.join(self.run_dir, "config.json")
        if hasattr(config, "to_json"):
            payload = config.to_json()
        else:
            import dataclasses

            payload = json.dumps(dataclasses.asdict(config), indent=2)
        with open(path, "w") as f:
            f.write(payload)

    def load_config_dict(self) -> Optional[dict]:
        path = os.path.join(self.run_dir, "config.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def save_meta(self, meta: dict) -> None:
        """Run metadata beyond the model config (e.g. prng impl, loader
        config). Merges with any existing metadata (multiple writers)."""
        merged = self.load_meta()
        merged.update(meta)
        with open(os.path.join(self.run_dir, "run_meta.json"), "w") as f:
            json.dump(merged, f, indent=2)

    def load_meta(self) -> dict:
        path = os.path.join(self.run_dir, "run_meta.json")
        if not os.path.exists(path):
            return {}
        with open(path) as f:
            return json.load(f)

    # -- state save/restore ------------------------------------------------
    def save(self, state: TrainState, force: bool = False) -> bool:
        step = int(state.step)
        if step in (self._mgr.all_steps() or []):
            return False  # already on disk (e.g. forced save after policy save)
        return self._mgr.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(_as_pytree(state))
            ),
            force=force,
        )

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    _KEY_SHAPES = {"threefry2x32": (2,), "rbg": (4,), "unsafe_rbg": (4,)}

    def restore(self, template: TrainState, step: Optional[int] = None) -> TrainState:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.ckpt_dir}")
        # the checkpointed raw rng key's shape depends on the run's prng
        # impl (run_meta.json); adapt a COPY of the template so any caller
        # restores correctly regardless of its own impl (the caller's
        # template is never mutated)
        tpl = _as_pytree(template)
        impl = self.load_meta().get("prng_impl")
        if impl in self._KEY_SHAPES:
            import jax.numpy as jnp

            tpl = dict(tpl, rng=jnp.zeros(self._KEY_SHAPES[impl], jnp.uint32))
        restored = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(tpl)
            ),
        )["state"]
        return TrainState(
            restored["params"], restored["opt_state"],
            restored["step"], restored["rng"])

    def wait_until_finished(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()

    # -- preemption safety -------------------------------------------------
    def save_on_signal(self, get_state, signals=(signal.SIGTERM,)) -> None:
        """Install handlers that synchronously save before dying."""

        def handler(signum, frame):
            state = get_state()
            if state is not None:
                self.save(state, force=True)
                self.wait_until_finished()
            raise SystemExit(128 + signum)

        for s in signals:
            signal.signal(s, handler)


def _as_pytree(state: TrainState) -> dict:
    return {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
        "rng": state.rng,
    }
