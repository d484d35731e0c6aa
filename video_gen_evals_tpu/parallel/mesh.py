"""Device mesh and sharding rules (SURVEY §2.3 / §5.8 rebuild plan).

The reference's only multi-device mechanism is single-process
``nn.DataParallel`` (off by default, ref ``train.py:76-79``). Here parallelism
is first-class and TPU-native:

- one ``jax.sharding.Mesh`` with a ``data`` axis (batch/window sharding — the
  scaling axis for both training and benchmark sweeps) and a ``model`` axis
  (Megatron-style tensor parallelism over the transformer FFN/attention and
  conv channels; reserved, 1 by default since the model is small);
- parameters replicated (or TP-sharded) via ``NamedSharding``; gradients are
  reduced by XLA-inserted ``psum`` over ICI — no hand-written collectives;
- multi-host extends the same mesh via ``jax.distributed.initialize``.
"""

from __future__ import annotations

import functools
import typing as T

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: T.Optional[int] = None,
    n_model: int = 1,
    devices: T.Optional[T.Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    if n_model < 1:
        raise ValueError(f"n_model must be >= 1, got {n_model}")
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data < 1:
        raise ValueError(
            f"need at least n_model={n_model} devices to form a mesh, "
            f"have {len(devices)}"
        )
    need = n_data * n_model
    if need > len(devices):
        raise ValueError(
            f"mesh ({n_data} data x {n_model} model) needs {need} devices, "
            f"have {len(devices)} — on CPU, set "
            "XLA_FLAGS=--xla_force_host_platform_device_count=N to get "
            "virtual devices"
        )
    if need < len(devices) and jax.process_count() > 1:
        # a partial mesh in a multi-process runtime strands the processes
        # whose devices were cut — they could never join the collectives
        raise ValueError(
            f"multi-process runtime: the mesh must span all "
            f"{len(devices)} global devices, got {n_data}x{n_model}={need}"
        )
    use = devices[:need]
    arr = np.array(use).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch/window) axis sharded over ``data``."""
    return NamedSharding(mesh, P("data"))


def shard_items(
    items: T.Sequence, host_id: int, num_hosts: int
) -> T.List:
    """Deterministic strided split of a work list across hosts (SURVEY §5.8:
    multi-pod sweeps shard the video manifest over hosts and merge the JSON
    shards on DCN). Strided (``items[host_id::num_hosts]``) rather than
    contiguous so per-class runs of a sorted manifest spread evenly.

    Every item lands on exactly one host; hosts agree on the split as long as
    they scan the same manifest (same directory contents, same order).
    """
    if num_hosts < 1:
        raise ValueError(f"num_hosts must be >= 1, got {num_hosts}")
    if not 0 <= host_id < num_hosts:
        raise ValueError(
            f"host_id must be in [0, {num_hosts}), got {host_id}"
        )
    return list(items[host_id::num_hosts])


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_global(x, sharding: NamedSharding):
    """``device_put`` that also works on a multi-process mesh.

    ``jax.device_put`` refuses shardings with non-addressable devices; on a
    multi-host mesh every process holds the same full host value (the
    harness model: deterministic global batch everywhere), so build the
    global array explicitly — each process materializes only the shards its
    local devices own. Typed PRNG keys round-trip through ``key_data`` (the
    callback path can't construct extended dtypes directly).

    ``put_global``/``fetch_global`` deliberately parallel
    ``jax.experimental.multihost_utils`` (host_local_array_to_global_array /
    process_allgather): those assume uniform leaf kinds per call, while these
    handle mixed trees (host + local + cross-process leaves, typed PRNG keys)
    in one pass with replicated-value semantics.
    """
    if sharding.is_fully_addressable:
        return jax.device_put(x, sharding)

    def one(leaf):
        if isinstance(leaf, jax.Array) and leaf.sharding == sharding:
            return leaf  # already placed exactly as requested
        if hasattr(leaf, "dtype") and jax.dtypes.issubdtype(
            leaf.dtype, jax.dtypes.prng_key
        ):
            kd = np.asarray(jax.random.key_data(leaf))
            g = jax.make_array_from_callback(
                kd.shape, sharding, lambda idx: kd[idx]
            )
            return jax.random.wrap_key_data(g)
        if isinstance(leaf, jax.Array) and leaf.is_fully_addressable:
            # keep device-resident leaves on device: slicing a jax.Array in
            # the callback hands make_array_from_callback device buffers
            # (device-to-device placement), where np.asarray would force a
            # device->host->device round trip per leaf — on the hot
            # per-chunk extraction path that round trip dominates
            return jax.make_array_from_callback(
                leaf.shape, sharding, lambda idx: leaf[idx]
            )
        leaf = np.asarray(leaf)
        return jax.make_array_from_callback(
            leaf.shape, sharding, lambda idx: leaf[idx]
        )

    return jax.tree.map(one, x)


def fetch_global(x):
    """``device_get`` that also works on a multi-process mesh.

    Fully-addressable leaves pass straight through. Leaves that span other
    processes are all-gathered onto every host through ONE jitted identity
    with replicated out-shardings — this is a COLLECTIVE: every process in
    the mesh must call it at the same point. Typed PRNG keys come back as
    their raw ``key_data`` (numpy cannot hold extended dtypes).
    """
    leaves, treedef = jax.tree.flatten(x)
    idx = [
        i
        for i, l in enumerate(leaves)
        if isinstance(l, jax.Array) and not l.is_fully_addressable
    ]
    if not idx:
        return jax.device_get(x)
    remote = set(idx)
    out = [l if i in remote else jax.device_get(l) for i, l in enumerate(leaves)]
    # group by mesh (leaves may live on different meshes), and only the
    # cross-process leaves ride the collective — host/local leaves must not
    # be fed to the global-mesh program
    by_mesh: T.Dict[Mesh, T.List[int]] = {}
    for i in idx:
        by_mesh.setdefault(leaves[i].sharding.mesh, []).append(i)
    for mesh, ids in by_mesh.items():
        sub = [
            jax.random.key_data(leaves[i])
            if jax.dtypes.issubdtype(leaves[i].dtype, jax.dtypes.prng_key)
            else leaves[i]
            for i in ids
        ]
        gathered = _replicated_gather(mesh, len(sub))(*sub)
        for i, g in zip(ids, gathered):
            out[i] = np.asarray(g.addressable_data(0))
    return jax.tree.unflatten(treedef, out)


@functools.lru_cache(maxsize=32)
def _replicated_gather(mesh: Mesh, n: int):
    """Cached jitted identity with replicated out-shardings — reusing the
    wrapper keeps repeat gathers (e.g. the per-epoch checkpoint save) on the
    in-process jit cache instead of re-tracing every call."""
    rep = NamedSharding(mesh, P())
    return jax.jit(lambda *t: t, out_shardings=(rep,) * n)


def _spec_for_param(path: str) -> P:
    """Megatron-style TP layout: column-parallel qkv/linear1 (shard output
    features), row-parallel out_proj/linear2 (shard input features); conv
    stacks shard output channels; everything else replicated."""
    if "in_proj" in path or "linear1" in path:
        if path.endswith("kernel"):
            return P(None, "model")
        return P("model")  # bias on the sharded output dim
    if "out_proj/kernel" in path or "linear2/kernel" in path:
        return P("model", None)
    if ("state_enc" in path or "motion_enc" in path) and path.endswith("kernel"):
        if "stem" in path or "conv" in path:
            return P(None, None, "model")  # [k, in, out] -> shard out channels
    return P()


def tp_param_sharding(mesh: Mesh, params) -> T.Any:
    """Tree of NamedShardings for the fusion-encoder param tree."""

    def one(path_tuple, leaf):
        path = "/".join(str(getattr(k, "key", k)) for k in path_tuple)
        spec = _spec_for_param(path)
        # never shard a dim that doesn't divide evenly
        shape = getattr(leaf, "shape", ())
        n_model = mesh.shape["model"]
        ok = all(
            dim % n_model == 0 for dim, ax in zip(shape, spec) if ax == "model"
        )
        return NamedSharding(mesh, spec if ok else P())

    return jax.tree_util.tree_map_with_path(one, params)


def initialize_distributed(
    coordinator_address: T.Optional[str] = None,
    num_processes: T.Optional[int] = None,
    process_id: T.Optional[int] = None,
) -> None:
    """Multi-host bring-up (SURVEY §5.8): joins this process to the global
    device mesh over DCN via ``jax.distributed.initialize``; afterwards
    ``make_mesh`` spans all hosts' devices. No-op for single-process runs.

    On the CPU backend the cross-process collectives implementation defaults
    to none; select gloo (compiled into jaxlib) so multi-process CPU runs —
    the TPU-less validation tier, ``tests/test_distributed.py`` — get working
    psum/all-gather. TPU runs are unaffected (ICI/DCN collectives are native).
    """
    if num_processes is None or num_processes <= 1:
        return
    # Select gloo whenever a CPU client may be created: explicit cpu
    # platform, cpu listed as a fallback, or platform auto-detection (a
    # CPU-only jaxlib with jax_platforms unset would otherwise keep the
    # non-functional default collectives and hang at the first psum). The
    # setting only affects the CPU backend — TPU ICI/DCN collectives are
    # native and unaffected.
    platforms = jax.config.jax_platforms or ""
    if platforms == "" or "cpu" in platforms.split(","):
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
