"""Checkpointing via orbax (SURVEY §5.4 rebuild plan).

The reference only saves best-on-test-loss model state_dicts with no
optimizer/step state (no true resume, ref ``train.py:450-455``). Here we keep
that capability (export/import of bare params, incl. torch ``.pt`` via
``models.torch_compat``) and add what it lacks: full train-state checkpoints
{params, opt_state, step} for exact resume.

Multi-process runs (``jax.process_count() > 1``, SURVEY §5.8): state that
spans hosts is first all-gathered (``parallel.fetch_global`` — a collective,
so EVERY process must reach the save call), then process 0 alone writes a
flat ``.npz`` keyed by tree paths, and all processes synchronize before
returning. Restore reads the same file on every process (shared filesystem —
or any path holding identical bytes) and the experiment re-places leaves onto
their live shardings. Orbax stays the single-process format; the ``.npz``
sidesteps orbax's own multihost barriers, which would require coordinated
per-process handshakes this harness doesn't need.
"""

from __future__ import annotations

import os
import queue
import re
import threading
import typing as T

import jax
import numpy as np
import orbax.checkpoint as ocp
from jax.tree_util import keystr, tree_flatten_with_path


def _abs(path: str) -> str:
    return os.path.abspath(path)


def _npz_path(path: str) -> str:
    return path if path.endswith(".npz") else path + ".npz"


def _flatten_with_paths(tree) -> T.Dict[str, np.ndarray]:
    leaves, _ = tree_flatten_with_path(tree)
    return {keystr(kp): np.asarray(v) for kp, v in leaves}


_DICT_KEY_RE = re.compile(r"\['([^']*)'\]")


def _nest_from_paths(flat: T.Dict[str, np.ndarray]) -> T.Dict[str, T.Any]:
    """Rebuild a pure nested-dict tree (flax param trees) from keystr paths
    like ``['encoder']['stem']['kernel']``. Trees with non-dict nodes
    (namedtuples, lists) need a ``like`` template instead."""
    root: T.Dict[str, T.Any] = {}
    for key, val in flat.items():
        parts = _DICT_KEY_RE.findall(key)
        if "".join(f"['{p}']" for p in parts) != key:
            raise ValueError(
                f"cannot rebuild nested structure for npz key {key!r} "
                "(non-dict pytree node) — pass a `like` template"
            )
        d = root
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = val
    return root


def _barrier() -> None:
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("video_gen_evals_ckpt")


def _save_multiprocess(path: str, tree) -> None:
    """Collective: all-gather ``tree`` to every host, write on process 0."""
    from ..parallel.mesh import fetch_global

    host = fetch_global(tree)
    if jax.process_index() == 0:
        out = _npz_path(_abs(path))
        os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
        # atomic publish: a crash mid-write must never leave a torn npz at
        # the published path (orbax's single-process save already finalizes
        # via rename; match that here)
        tmp = f"{out}.{os.getpid()}.tmp.npz"
        np.savez(tmp, **_flatten_with_paths(host))
        os.replace(tmp, out)
    _barrier()


def _restore_npz(path: str, like):
    """Rebuild ``like``'s tree structure from a path-keyed flat npz."""
    flat, treedef = tree_flatten_with_path(like)
    with np.load(_npz_path(_abs(path))) as z:
        missing = [keystr(kp) for kp, _ in flat if keystr(kp) not in z.files]
        if missing:
            raise KeyError(
                f"checkpoint {path} is missing {len(missing)} leaves, "
                f"e.g. {missing[:3]}"
            )
        leaves = [z[keystr(kp)] for kp, _ in flat]
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(like), leaves
    )


class AsyncSaver:
    """One-worker FIFO background checkpoint writer.

    Through the axon tunnel a checkpoint save is dominated by the
    ``device_get`` transfer (~30 s measured for a flagship train state,
    BENCH_NOTES "Config-5 end-to-end on-chip") — and a transfer blocks only
    the CALLING thread while the accelerator keeps computing. Submitting the
    save to a worker thread overlaps the whole fetch+write with the next
    epoch's steps. The reference has no equivalent (its ``torch.save`` of a
    CUDA state_dict blocks the loop, ref ``train.py:450-455``).

    Guarantees:
      - FIFO single worker: saves land in submit order, so a resume file is
        never overwritten by an older epoch's bytes.
      - Deferred errors: a failed save is re-raised at the next
        :meth:`submit` or :meth:`wait` — never lost (resume correctness
        depends on knowing the file is there).
      - Callers must :meth:`wait` before relying on the files (the
        ``Experiment.run`` loop does this on exit; the worker is a daemon
        thread, so an un-waited interpreter exit may truncate in-flight
        writes — exactly a crash, which the atomic tmp+rename publish and
        orbax's own finalize-by-rename already make safe).

    Buffers handed to a submitted save must not be donated afterwards:
    the training loop snapshots the state on device first (one jitted copy,
    HBM-bandwidth cheap) because ``train_step`` donates its input state.
    """

    def __init__(self) -> None:
        self._q: "queue.Queue[T.Callable[[], None]]" = queue.Queue()
        self._thread: T.Optional[threading.Thread] = None
        self._err: T.Optional[BaseException] = None
        self._lock = threading.Lock()

    def _loop(self) -> None:
        while True:
            fn = self._q.get()
            try:
                fn()
            except BaseException as e:  # noqa: BLE001 — deferred to caller
                with self._lock:
                    if self._err is None:
                        self._err = e
            finally:
                self._q.task_done()

    def _raise_pending(self) -> None:
        with self._lock:
            err, self._err = self._err, None
        if err is not None:
            raise RuntimeError("async checkpoint save failed") from err

    def submit(self, fn: T.Callable[[], None]) -> None:
        self._raise_pending()
        if self._thread is None or not self._thread.is_alive():
            self._thread = threading.Thread(
                target=self._loop, name="ckpt-saver", daemon=True
            )
            self._thread.start()
        self._q.put(fn)

    def wait(self) -> None:
        """Block until every submitted save has finished; re-raise failures."""
        self._q.join()
        self._raise_pending()


def save_params(path: str, params) -> None:
    if jax.process_count() > 1:
        _save_multiprocess(path, params)
        return
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(_abs(path), jax.device_get(params))
    ckptr.wait_until_finished()


def restore_params(path: str, like=None):
    if os.path.exists(_npz_path(_abs(path))) and not os.path.isdir(_abs(path)):
        if like is not None:
            return _restore_npz(path, like)
        # param trees are pure nested dicts — rebuild from the key paths so
        # multi-process-trained checkpoints load anywhere without a template
        with np.load(_npz_path(_abs(path))) as z:
            return _nest_from_paths({k: z[k] for k in z.files})
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(_abs(path))


def save_train_state(path: str, state: T.Dict[str, T.Any]) -> None:
    """state: {"params": ..., "opt_state": ..., "step": int} pytree."""
    if jax.process_count() > 1:
        _save_multiprocess(path, state)
        return
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(_abs(path), jax.device_get(state))
    ckptr.wait_until_finished()


def restore_train_state(path: str, like: T.Optional[T.Dict[str, T.Any]] = None):
    if os.path.exists(_npz_path(_abs(path))) and not os.path.isdir(_abs(path)):
        if like is None:
            raise ValueError(
                "restoring a multi-process .npz checkpoint needs a `like` "
                "tree (shapes/structure template)"
            )
        return _restore_npz(path, like)
    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        return ckptr.restore(_abs(path), like)
    return ckptr.restore(_abs(path))
