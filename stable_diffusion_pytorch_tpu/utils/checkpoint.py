"""Orbax checkpointing with the reference's directory/resume semantics.

Counterpart of the Accelerate save/load logic in
/root/reference/train_unet.py:261-312 and :390-407:

- checkpoints live at ``{ckpt_dir}/checkpoint-{global_step}``
- ``resume_from_checkpoint="latest"`` scans ``ckpt_dir`` for ``checkpoint-*``
  entries, sorts by the integer suffix and restores the newest
- ``keep_last_only`` prunes the previous checkpoint after a successful save
- resume replay math: ``global_step`` from the dir name; ``start_epoch`` and
  the in-epoch ``resume_step`` (micro-batches to skip, grad-accum-corrected)
  exactly as train_unet.py:284-312
"""

from __future__ import annotations

import math
import os
import shutil
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp


def checkpoint_path(ckpt_dir: str, global_step: int) -> str:
    return os.path.join(ckpt_dir, f"checkpoint-{global_step}")


def find_latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Scan for the newest ``checkpoint-N`` dir (train_unet.py:266-273)."""
    if not os.path.isdir(ckpt_dir):
        return None
    dirs = [d for d in os.listdir(ckpt_dir) if d.startswith("checkpoint")]
    dirs = sorted(dirs, key=lambda x: int(x.split("-")[1]))
    return os.path.join(ckpt_dir, dirs[-1]) if dirs else None


def save_checkpoint(path: str, state: Any) -> None:
    """Blocking save of a pytree state (params/opt_state/step)."""
    path = os.path.abspath(path)
    if os.path.exists(path):
        shutil.rmtree(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state)
    ckptr.wait_until_finished()
    ckptr.close()


def load_params_for_inference(path: str) -> Any:
    """Restore just the model params from a trainer checkpoint for sampling.

    Prefers the EMA shadow weights when the checkpoint carries them
    (--ema-decay > 0 runs). Restores without an abstract target, so it works
    for any model config the checkpoint was trained with.
    """
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path))
    ckptr.close()
    ema = restored.get("ema_params")
    if ema is not None and jax.tree_util.tree_leaves(ema):
        return ema
    return restored["params"]


def restore_checkpoint(path: str, abstract_state: Any) -> Any:
    """Restore into the structure/shardings of ``abstract_state``.

    A pytree-structure mismatch on ``opt_state`` almost always means the
    checkpoint was saved under a different optimizer layout than the current
    flags select (the fused AdamW default changed the opt_state pytree vs the
    optax chain — trainers/optim.py). Orbax's raw error doesn't point at the
    cause, so diagnose it here and name the escape hatches.
    """
    ckptr = ocp.StandardCheckpointer()
    try:
        restored = ckptr.restore(
            os.path.abspath(path),
            jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, abstract_state),
        )
    except Exception as e:  # noqa: BLE001 - re-raise with diagnosis
        msg = str(e)
        # match narrowly: only messages that name a tree/structure/shape
        # disagreement — a bare "missing"/"not found" (corrupt or partially
        # written checkpoint, missing metadata file) is NOT a layout issue
        # and must not steer the operator toward flipping optimizer flags
        looks_structural = any(
            s in msg.lower()
            for s in ("tree structure", "pytreedef", "structure mismatch",
                      "structures do not match", "shape mismatch",
                      "does not match the structure")
        ) or ("structure" in msg.lower() and "mismatch" in msg.lower())
        if looks_structural:
            raise RuntimeError(
                f"checkpoint restore from {path} failed with a pytree "
                "structure mismatch. If this checkpoint was saved with a "
                "different optimizer layout, re-run with the matching flags: "
                "checkpoints from before the fused-AdamW default (or saved "
                "with --no-fused-adamw) need --no-fused-adamw; fused-layout "
                "checkpoints need the default. Moment-dtype flags "
                "(--adam-mu-dtype/--adam-nu-dtype/--use-8bit-adam) and "
                "--gradient-accumulation-steps>1 also change the layout and "
                "must match the saving run. Note: the int8-Adam moment "
                "storage layout changed in round 4 (parameter-shaped codes); "
                "--use-8bit-adam checkpoints saved before that change cannot "
                "be restored by this version.\n"
                f"Underlying orbax error: {msg}"
            ) from e
        raise
    finally:
        ckptr.close()
    return restored


class CheckpointManager:
    """Save/resume manager with keep_last_only pruning (train_unet.py:390-407)."""

    def __init__(self, ckpt_cfg):
        self.ckpt_dir = ckpt_cfg.ckpt_dir
        self.keep_last_only = ckpt_cfg.keep_last_only
        self.resume_from = ckpt_cfg.resume_from_checkpoint
        self.last_ckpt: Optional[str] = None

    def save(self, global_step: int, state: Any, epoch: Optional[int] = None) -> str:
        if epoch is not None:
            path = os.path.join(self.ckpt_dir, f"epoch_{epoch}")
        else:
            path = checkpoint_path(self.ckpt_dir, global_step)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        prune = self.last_ckpt if (self.keep_last_only and self.last_ckpt) else None
        save_checkpoint(path, state)
        if prune and os.path.exists(prune) and os.path.abspath(prune) != os.path.abspath(path):
            shutil.rmtree(prune)
        self.last_ckpt = path
        return path

    def resolve_resume_path(self) -> Optional[str]:
        """train_unet.py:261-282: explicit path, or 'latest' scan, or None."""
        if not self.resume_from:
            return None
        if self.resume_from == "latest":
            return find_latest_checkpoint(self.ckpt_dir)
        path = self.resume_from
        if not os.path.isabs(path) and not os.path.exists(path):
            candidate = os.path.join(self.ckpt_dir, os.path.basename(path))
            if os.path.exists(candidate):
                path = candidate
        return path if os.path.exists(path) else None

    def restore(self, abstract_state: Any) -> Tuple[Optional[Any], int]:
        """Returns (state or None, resumed_global_step)."""
        path = self.resolve_resume_path()
        if path is None:
            return None, 0
        state = restore_checkpoint(path, abstract_state)
        base = os.path.basename(path.rstrip("/"))
        try:
            step = int(base.split("-")[1])
        except (IndexError, ValueError):
            step = 0
        return state, step


def resume_train_state_math(
    num_batches_per_epoch: int,
    gradient_accumulation_steps: int,
    max_train_steps: Optional[int],
    max_train_epochs: int,
    resumed_global_step: int,
) -> dict:
    """The reference's step/epoch replay arithmetic (train_unet.py:284-312).

    Returns {max_train_steps, max_train_epochs, global_step, start_epoch,
    resume_step} where resume_step counts MICRO batches to skip inside the
    start epoch.
    """
    num_update_steps_per_epoch = math.ceil(
        num_batches_per_epoch / gradient_accumulation_steps
    )
    if max_train_steps is None:
        max_train_steps = max_train_epochs * num_update_steps_per_epoch
    else:
        max_train_epochs = math.ceil(max_train_steps / num_update_steps_per_epoch)
    global_step = resumed_global_step
    start_epoch = global_step // num_update_steps_per_epoch if global_step else 0
    resume_step = (
        global_step % num_update_steps_per_epoch * gradient_accumulation_steps
        if global_step
        else 0
    )
    return {
        "max_train_steps": max_train_steps,
        "max_train_epochs": max_train_epochs,
        "global_step": global_step,
        "start_epoch": start_epoch,
        "resume_step": resume_step,
        "num_update_steps_per_epoch": num_update_steps_per_epoch,
    }
