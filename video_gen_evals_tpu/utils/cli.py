"""Shared CLI plumbing for pipeline entry points.

Multi-host bring-up flags (SURVEY §5.8): every process of a distributed run
invokes the same CLI with the same ``--coordinator``/``--num-processes``
plus its own ``--process-id``; after bring-up, device meshes (``--dp``,
``--mesh-data``) span ALL hosts' devices and ``--host-id -1`` resolves to
``jax.process_index()``.
"""

from __future__ import annotations

import argparse


def add_distributed_args(p: argparse.ArgumentParser) -> None:
    p.add_argument(
        "--coordinator",
        default=None,
        help="multi-host bring-up (SURVEY §5.8): jax.distributed coordinator "
        "address host:port; run this CLI on every process with the same "
        "flags plus its own --process-id",
    )
    p.add_argument(
        "--num-processes",
        type=int,
        default=None,
        help="total number of processes in the distributed run",
    )
    p.add_argument(
        "--process-id",
        type=int,
        default=None,
        help="this process's index in [0, --num-processes)",
    )


def maybe_initialize_distributed(args: argparse.Namespace) -> None:
    """Join the distributed runtime when --num-processes > 1. Must run
    before anything creates the jax backend client."""
    if getattr(args, "num_processes", None) is None or args.num_processes <= 1:
        if args.coordinator is not None or args.process_id is not None:
            raise SystemExit(
                "--coordinator/--process-id require --num-processes > 1 "
                "(without it they would be silently ignored)"
            )
        return
    if args.process_id is None:
        raise SystemExit(
            "--num-processes > 1 requires --process-id (this process's "
            "index in [0, --num-processes))"
        )
    if args.coordinator is None:
        raise SystemExit(
            "--num-processes > 1 requires --coordinator host:port (without "
            "it jax falls back to cluster auto-detection, which dies with "
            "an opaque error on bare hosts or may pick an env-derived "
            "coordinator that conflicts with the explicit process counts)"
        )
    import jax

    from ..parallel import initialize_distributed

    initialize_distributed(
        args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    print(
        f"Joined distributed runtime: process {jax.process_index()} "
        f"of {jax.process_count()} ({jax.local_device_count()} local / "
        f"{len(jax.devices())} global devices)"
    )
