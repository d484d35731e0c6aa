"""Real multi-process bring-up smoke for the SURVEY §5.8 DCN tier.

Spawns TWO actual Python processes that join one JAX distributed runtime
(``parallel.initialize_distributed`` -> ``jax.distributed.initialize`` over a
localhost coordinator), then checks everything the multi-pod CLIs rely on:
``process_count``/``process_index`` (the ``--host-id -1`` resolution),
global-vs-local device visibility, global mesh construction, and
process-index-keyed manifest sharding. The sharded *numerics* are covered by
the virtual-8-device equivalence tests; this covers the actual cross-process
runtime wiring those tests can't."""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    ).strip()
    import jax
    jax.config.update("jax_platforms", "cpu")

    port, pid = sys.argv[1], int(sys.argv[2])
    from video_gen_evals_tpu.parallel.mesh import (
        initialize_distributed, make_mesh, shard_items,
    )
    initialize_distributed(f"localhost:{port}", num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == pid, (jax.process_index(), pid)
    assert jax.local_device_count() == 2
    assert len(jax.devices()) == 4  # global view: both hosts' devices

    # global mesh spans both processes' devices
    mesh = make_mesh(4, 1)
    assert mesh.devices.shape == (4, 1)
    assert {d.process_index for d in mesh.devices.flat} == {0, 1}

    # the CLIs' --host-id -1 path: process_index keys the manifest shard
    mine = shard_items(list(range(7)), jax.process_index(), jax.process_count())
    expected = list(range(7))[pid::2]
    assert mine == expected, (mine, expected)
    print(f"WORKER{pid}_OK")
    """
)


def test_two_process_distributed_bringup(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    env.pop("PALLAS_AXON_POOL_IPS", None)  # never touch the TPU tunnel
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(port), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd="/root/repo", env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for pid, proc in enumerate(procs):
        try:
            out, err = proc.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for x in procs:
                x.kill()
            pytest.fail(f"worker {pid} timed out joining the coordinator")
        outs.append((proc.returncode, out, err))
    for pid, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"worker {pid} failed:\n{err}"
        assert f"WORKER{pid}_OK" in out
