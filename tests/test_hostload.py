"""Host-contention guard (round-5 bench discipline)."""

import os

import pytest

from video_gen_evals_tpu.utils import hostload


def test_snapshot_fields():
    s = hostload.snapshot()
    assert set(s) == {"load1", "load5", "ncpu", "busy_others", "contended"}
    assert s["ncpu"] >= 1
    assert isinstance(s["contended"], bool)
    assert isinstance(s["busy_others"], list)


def test_own_process_not_counted_as_other():
    # this test itself is running (state R) but must not trip the guard's
    # "other runnable processes" detection
    mine = hostload._my_process_group()
    assert os.getpid() in mine
    comm_of_self = None
    with open(f"/proc/{os.getpid()}/stat") as f:
        raw = f.read()
    comm_of_self = raw[raw.index("(") + 1 : raw.rindex(")")]
    assert comm_of_self  # sanity: parser matches what _runnable_others uses


def test_guard_refuses_on_contended_host(monkeypatch, capsys):
    monkeypatch.setattr(
        hostload,
        "snapshot",
        lambda: {
            "load1": 9.0,
            "load5": 9.0,
            "ncpu": 1,
            "busy_others": ["pytest"],
            "contended": True,
        },
    )
    monkeypatch.setenv("BENCH_REQUIRE_IDLE", "1")
    with pytest.raises(SystemExit) as e:
        hostload.guard("unit-test")
    assert e.value.code == 4
    assert "CONTENDED" in capsys.readouterr().err


def test_guard_labels_but_allows_by_default(monkeypatch, capsys):
    monkeypatch.setattr(
        hostload,
        "snapshot",
        lambda: {
            "load1": 9.0,
            "load5": 9.0,
            "ncpu": 1,
            "busy_others": [],
            "contended": True,
        },
    )
    monkeypatch.delenv("BENCH_REQUIRE_IDLE", raising=False)
    snap = hostload.guard("unit-test")
    assert snap["contended"]
    assert "NOT comparable" in capsys.readouterr().err


def test_require_backend_returns_on_live_backend():
    """utils/backend_guard: with a live (CPU) backend the guard returns
    immediately instead of re-exec'ing or aborting."""
    from video_gen_evals_tpu.utils.backend_guard import require_backend

    require_backend(timeout_s=120)
