"""Checkpoint save/restore (orbax), replacing mmcv CheckpointHook
(SURVEY.md §5 checkpoint/resume: model + optimizer + meta per epoch,
``resume_from`` restores step/optimizer)."""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _manager(work_dir: str, max_to_keep: Optional[int] = None
             ) -> ocp.CheckpointManager:
    path = os.path.abspath(work_dir)
    os.makedirs(path, exist_ok=True)
    options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                           create=True)
    return ocp.CheckpointManager(path, options=options)


def save_checkpoint(work_dir: str, state, step: int,
                    meta: Optional[dict] = None,
                    max_to_keep: Optional[int] = None) -> None:
    with _manager(work_dir, max_to_keep) as mgr:
        payload = dict(state=state)
        if meta:
            payload["meta"] = meta
        mgr.save(step, args=ocp.args.StandardSave(payload))
        mgr.wait_until_finished()


def load_checkpoint(work_dir: str, abstract_state,
                    step: Optional[int] = None):
    """Restore (state, meta). ``abstract_state`` provides the pytree/shape
    template (use jax.eval_shape over state creation)."""
    with _manager(work_dir) as mgr:
        step = mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {work_dir}")
        # meta has free-form scalar structure: restore it template-free,
        # then restore the state with the typed/sharded template
        raw = mgr.restore(step)
        meta = raw.get("meta", {}) if isinstance(raw, dict) else {}
        template = dict(state=abstract_state)
        if meta:
            template["meta"] = meta
        restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
        return restored["state"], meta


def load_params(work_dir: str, step: Optional[int] = None):
    """Template-free restore of model variables for inference/eval: returns
    ({'params': ..., 'batch_stats': ...}, meta) as plain pytrees — no
    optimizer-state template needed (publish_model.py parity: evaluation
    does not carry optimizer state)."""
    with _manager(work_dir) as mgr:
        step = mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {work_dir}")
        raw = mgr.restore(step)
        state = raw["state"]
        meta = raw.get("meta", {})
        return {"params": state["params"],
                "batch_stats": state.get("batch_stats", {})}, meta
