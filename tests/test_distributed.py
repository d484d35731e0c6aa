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
    from video_gen_evals_tpu.parallel.mesh import make_mesh, shard_items

    # join through the CLIs' own flag plumbing (utils.cli), exactly as
    # `--coordinator/--num-processes/--process-id` would on train/score/extract
    import argparse
    from video_gen_evals_tpu.utils.cli import (
        add_distributed_args, maybe_initialize_distributed,
    )
    p = argparse.ArgumentParser()
    add_distributed_args(p)
    maybe_initialize_distributed(p.parse_args([
        "--coordinator", f"localhost:{port}",
        "--num-processes", "2", "--process-id", str(pid),
    ]))
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

    # put_global round trip on the non-addressable mesh, all three leaf
    # kinds: host numpy, DEVICE-RESIDENT jax.Array (must not force a
    # host round trip — the hot per-chunk extraction path), typed PRNG key
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from video_gen_evals_tpu.parallel.mesh import fetch_global, put_global

    rep = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("data"))
    host_leaf = np.arange(8, dtype=np.float32).reshape(8, 1)
    dev_leaf = jnp.asarray(host_leaf) * 2.0          # local device array
    key_leaf = jax.random.key(42)
    g = put_global({"h": host_leaf, "d": dev_leaf}, dp)
    assert not g["d"].is_fully_addressable          # actually global
    back = fetch_global(g)
    np.testing.assert_array_equal(back["h"], host_leaf)
    np.testing.assert_array_equal(back["d"], host_leaf * 2.0)
    gk = put_global(key_leaf, rep)                  # typed key, replicated
    np.testing.assert_array_equal(
        fetch_global(gk), np.asarray(jax.random.key_data(key_leaf))
    )
    gr = put_global(dev_leaf, rep)                   # replicated placement
    np.testing.assert_array_equal(fetch_global(gr), host_leaf * 2.0)
    print(f"WORKER{pid}_OK")
    """
)


_TRAIN_WORKER = textwrap.dedent(
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
        initialize_distributed, make_mesh,
    )
    initialize_distributed(f"localhost:{port}", num_processes=2, process_id=pid)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    from video_gen_evals_tpu.models import EncoderConfig
    from video_gen_evals_tpu.models.fusion_encoder import init_encoder
    from video_gen_evals_tpu.train.step import (
        TrainState, make_optimizer, make_train_step,
    )

    dims_raw = {"vit": 16, "global": 9, "pose": 12, "beta": 10, "kp2d": 8}
    dims_diff = {"vit": 16, "global": 3, "pose": 4, "beta": 10, "kp2d": 8}
    cfg = EncoderConfig.create(dims_raw, dims_diff, d_model=32, time_layers=1,
                               time_heads=4)
    model, params = init_encoder(cfg, jax.random.key(0), clip_len=8)
    tx = make_optimizer(1e-3, 10)
    step = make_train_step(model, tx, donate=False)

    B = 8
    feats = np.random.default_rng(0).normal(
        size=(B, 8, cfg.input_dim)).astype(np.float32)
    labels = np.repeat(np.arange(4), 2).astype(np.int32)
    rng = jax.random.key(7)

    # single-device reference on a local device (same values everywhere)
    state0 = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    ref_state, ref_metrics = step(state0, jnp.asarray(feats),
                                  jnp.asarray(labels), rng)
    ref_loss = float(ref_metrics["total"])
    ref_leaf = np.asarray(jax.tree.leaves(ref_state.params)[0])

    # dp4 over 2 processes x 2 devices: params/opt/rng replicated, batch
    # rows sharded — each process contributes only ITS local rows
    mesh = make_mesh(4, 1)
    rep = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("data"))

    def repl(x):
        # device_put can't target non-addressable shardings; every process
        # holds the same host value, so build the global replica explicitly
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, rep, lambda idx: x[idx])

    gstate = jax.tree.map(
        repl, TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    )
    grng = jax.random.wrap_key_data(repl(jax.random.key_data(rng)))
    lo, hi = pid * (B // 2), (pid + 1) * (B // 2)
    gfeats = jax.make_array_from_process_local_data(
        dp, feats[lo:hi], feats.shape
    )
    glabels = jax.make_array_from_process_local_data(
        dp, labels[lo:hi], labels.shape
    )
    new_state, metrics = step(gstate, gfeats, glabels, grng)
    loss = float(metrics["total"])  # replicated -> addressable everywhere
    assert abs(loss - ref_loss) <= 2e-3 * abs(ref_loss), (loss, ref_loss)
    leaf = np.asarray(
        jax.tree.leaves(new_state.params)[0].addressable_data(0)
    )
    np.testing.assert_allclose(leaf, ref_leaf, rtol=2e-3, atol=1e-5)
    print(f"TRAIN{pid}_OK", loss)
    """
)


_HARNESS_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    ).strip()
    import jax
    jax.config.update("jax_platforms", "cpu")

    port, pid, root = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    from video_gen_evals_tpu.parallel.mesh import (
        initialize_distributed, make_mesh,
    )
    initialize_distributed(f"localhost:{port}", num_processes=2, process_id=pid)

    import json
    import numpy as np
    from video_gen_evals_tpu.core.config import PathsConfig, TrainConfig
    from video_gen_evals_tpu.data.fixtures import make_fixture_tree
    import video_gen_evals_tpu.train.experiment as E

    # every process builds the SAME deterministic fixture tree in its own dir
    root = os.path.join(root, f"proc{pid}")
    mesh_root, kp_root = make_fixture_tree(
        root, ["JumpingJack", "PushUps"], videos_per_class=4,
        frames=(60, 48, 40, 56), seed=5,
    )

    def cfg(name):
        return TrainConfig(
            paths=PathsConfig(
                real_meshes_dir=mesh_root,
                real_kp_dir=kp_root,
                generated_meshes_dir=os.path.join(root, "none"),
                human_scores=os.path.join(root, "none.json"),
            ),
            epochs=1, clip_len=16, stride=8, P=2, K=4,
            d_model=32, time_layers=1, time_heads=4,
            filter_classes=None,
            save_dir=os.path.join(root, "SAVE_" + name),
        )

    def events(exp):
        with open(exp.metrics_path) as f:
            return {json.loads(l)["event"]: json.loads(l) for l in f}

    # single-device reference (local devices only), then the REAL harness on
    # a mesh spanning BOTH processes (2 x 2 devices, gloo collectives)
    exp1 = E.Experiment(cfg("sd"), eval_batch=16)
    exp1.run()
    ev1 = events(exp1)

    expm = E.Experiment(cfg("dp4_2proc"), mesh=make_mesh(4, 1), eval_batch=16)
    expm.run()
    evm = events(expm)

    for key, field in (("train_epoch", "loss"), ("eval_loss", "loss"),
                       ("centroid_distance", "avg")):
        a, b = evm[key][field], ev1[key][field]
        assert abs(a - b) <= 2e-3 * max(abs(b), 1e-6), (key, a, b)
    print(f"HARNESS{pid}_OK", evm["train_epoch"]["loss"])
    """
)


def test_two_process_experiment_run_matches_single_device(tmp_path):
    """The COMPLETE harness (`Experiment.run`: epoch loop, centroids, eval
    passes, JSONL metrics) executes on a mesh spanning two real processes
    and reproduces the single-device epoch losses — multi-host training is
    the same program, with hosts contributing their local batch shards."""
    # 530 s alone on the 1-core host; the margin absorbs a concurrent
    # full-suite / TPU-bench load (840 s flaked under exactly that)
    _run_pair(_HARNESS_WORKER, "HARNESS", extra_args=[str(tmp_path)],
              timeout=1800)


_CKPT_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    ).strip()
    import jax
    jax.config.update("jax_platforms", "cpu")

    port, pid, root = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    from video_gen_evals_tpu.parallel.mesh import (
        fetch_global, initialize_distributed, make_mesh,
    )
    initialize_distributed(f"localhost:{port}", num_processes=2, process_id=pid)

    import numpy as np
    from video_gen_evals_tpu.core.config import PathsConfig, TrainConfig
    from video_gen_evals_tpu.data.fixtures import make_fixture_tree
    from video_gen_evals_tpu.train.experiment import Experiment
    from video_gen_evals_tpu.train.step import TrainState

    proot = os.path.join(root, f"proc{pid}")
    mesh_root, kp_root = make_fixture_tree(
        proot, ["JumpingJack"], videos_per_class=3, frames=(48, 40, 56), seed=9,
    )

    def cfg(name):
        return TrainConfig(
            paths=PathsConfig(
                real_meshes_dir=mesh_root,
                real_kp_dir=kp_root,
                generated_meshes_dir=os.path.join(proot, "none"),
                human_scores=os.path.join(proot, "none.json"),
            ),
            epochs=1, clip_len=16, stride=8, P=1, K=4,
            d_model=32, time_layers=1, time_heads=4,
            filter_classes=None,
            save_dir=os.path.join(proot, "SAVE_" + name),
        )

    mesh = make_mesh(4, 1)
    exp = Experiment(cfg("a"), mesh=mesh, eval_batch=8)
    # make the saved state distinguishable from a fresh init
    exp.state = TrainState(
        jax.tree.map(lambda p: p + 1.0, exp.state.params),
        exp.state.opt_state,
        exp.state.step + 3,
    )
    exp.best_eval_loss = 0.125
    # SHARED path on the common filesystem: process 0 writes the flat npz,
    # everyone barriers, then every process restores the same bytes
    ckpt = os.path.join(root, "shared_ckpt")
    exp.save_resume_checkpoint(4, path=ckpt)
    assert os.path.exists(ckpt + ".npz"), "npz checkpoint not written"

    exp2 = Experiment(cfg("b"), mesh=mesh, eval_batch=8)
    nxt = exp2.restore_resume_checkpoint(ckpt)
    assert nxt == 5, nxt
    assert exp2.best_eval_loss == 0.125, exp2.best_eval_loss
    a, b = fetch_global(exp.state.params), fetch_global(exp2.state.params)
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(x, y)
    assert int(fetch_global(exp2.state.step)) == 3
    print(f"CKPT{pid}_OK")
    """
)


def test_two_process_checkpoint_round_trip(tmp_path):
    """Multi-host checkpointing: on a mesh spanning two processes,
    ``save_resume_checkpoint`` all-gathers the train state (collective),
    writes ONE flat npz from process 0, and ``restore_resume_checkpoint``
    re-places every leaf onto its live sharding on every process — exact
    state round-trip without orbax multihost coordination."""
    _run_pair(_CKPT_WORKER, "CKPT", extra_args=[str(tmp_path)], timeout=600)


def _run_pair(worker_src: str, ok_tag: str, extra_args=(), timeout=300):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    env.pop("PALLAS_AXON_POOL_IPS", None)  # never touch the TPU tunnel
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", worker_src, str(port), str(pid),
             *extra_args],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd="/root/repo", env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for pid, proc in enumerate(procs):
        try:
            out, err = proc.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for x in procs:
                x.kill()
            pytest.fail(f"worker {pid} timed out joining the coordinator")
        outs.append((proc.returncode, out, err))
    for pid, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"worker {pid} failed:\n{err}"
        assert f"{ok_tag}{pid}_OK" in out


def test_two_process_train_step_matches_single_device():
    """The REAL fused train step (value_and_grad + AdamW + NaN-skip cond)
    runs dp4 over TWO processes (2 local devices each, gloo DCN collectives)
    and reproduces the single-device loss AND updated params — actual
    cross-process gradient psum, not the virtual-device approximation."""
    _run_pair(_TRAIN_WORKER, "TRAIN")


def test_two_process_distributed_bringup(tmp_path):
    _run_pair(_WORKER, "WORKER")
