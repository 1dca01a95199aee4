"""Opt-in profiler / progress (reference: src/common/profiler.h:17-62,
src/common/progress.h:16-50)."""

import io

from nanopolish_tpu.utils.profiler import (Progress, profile_scope, profiled,
                                           snapshot)


def test_profile_scope_disabled_by_default(monkeypatch):
    monkeypatch.delenv("NPT_PROFILE", raising=False)
    before = dict(snapshot())
    with profile_scope("t.disabled"):
        pass
    assert "t.disabled" not in snapshot() or \
        snapshot()["t.disabled"] == before.get("t.disabled")


def test_profile_scope_accumulates(monkeypatch):
    monkeypatch.setenv("NPT_PROFILE", "1")
    for _ in range(3):
        with profile_scope("t.scope"):
            pass
    calls, secs = snapshot()["t.scope"]
    assert calls >= 3 and secs >= 0.0

    @profiled
    def f(x):
        return x + 1

    assert f(1) == 2
    assert any("f" in k for k in snapshot())


def test_progress_bar_renders():
    buf = io.StringIO()
    p = Progress("train", width=10, fp=buf)
    p.update(0.5)
    p.end()
    s = buf.getvalue()
    assert " 50%" in s and "100%" in s and "[train]" in s
