"""Checkpointing via orbax (SURVEY §5.4 rebuild plan).

The reference only saves best-on-test-loss model state_dicts with no
optimizer/step state (no true resume, ref ``train.py:450-455``). Here we keep
that capability (export/import of bare params, incl. torch ``.pt`` via
``models.torch_compat``) and add what it lacks: full train-state checkpoints
{params, opt_state, step} for exact resume.
"""

from __future__ import annotations

import os
import typing as T

import jax
import orbax.checkpoint as ocp


def _abs(path: str) -> str:
    return os.path.abspath(path)


def save_params(path: str, params) -> None:
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(_abs(path), jax.device_get(params))
    ckptr.wait_until_finished()


def restore_params(path: str):
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(_abs(path))


def save_train_state(path: str, state: T.Dict[str, T.Any]) -> None:
    """state: {"params": ..., "opt_state": ..., "step": int} pytree."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(_abs(path), jax.device_get(state))
    ckptr.wait_until_finished()


def restore_train_state(path: str, like: T.Optional[T.Dict[str, T.Any]] = None):
    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        return ckptr.restore(_abs(path), like)
    return ckptr.restore(_abs(path))
