"""Terminal UI protocol tests (mlff_tpu/utils/ui.py; reference
sgdml/utils/ui.py:60-489 behavior parity where the protocol is shared)."""

import io as _io

import numpy as np
import pytest

from mlff_tpu.utils import ui


@pytest.fixture(autouse=True)
def _no_tty(monkeypatch):
    """Default every test to non-TTY mode (deterministic plain output)."""
    monkeypatch.setenv("MLFF_TPU_FORCE_TTY", "0")
    ui._last_pct["pct"] = -1


def test_callback_toggle_done(capsys):
    ui.callback(1, 1, "building")
    out = capsys.readouterr().out
    assert "[DONE]" in out and "building" in out


def test_callback_toggle_warn(capsys):
    ui.callback(1, 1, "building", done_with_warning=True)
    assert "[WARN]" in capsys.readouterr().out


def test_callback_percent_and_rate_limit(capsys):
    ui.callback(10, 100, "assembly")
    ui.callback(11, 100, "assembly")  # same 10%-bucket: suppressed (non-TTY)
    ui.callback(50, 100, "assembly")
    ui.callback(100, 100, "assembly")
    out = capsys.readouterr().out
    assert "[ 10%]" in out
    assert "[ 11%]" not in out
    assert "[ 50%]" in out
    assert "[100%]" in out


def test_callback_secondary_string(capsys):
    ui.callback(1, 1, "task", sec_disp_str="extra info")
    assert "extra info" in capsys.readouterr().out


def test_sec_callback_routes_to_main(capsys):
    events = []
    ui.sec_callback(50, 100, disp_str="sub",
                    main_callback=lambda c, sec_disp_str: events.append(sec_disp_str))
    assert events == ["sub |  50%"]


def test_colors_plain_without_tty():
    # non-TTY: no escape codes anywhere
    for fn in (ui.info_str, ui.pass_str, ui.warn_str, ui.fail_str,
               ui.gray_str, ui.white_bold_str, ui.underline_str):
        assert fn("x") == "x"


def test_colors_escape_with_tty(monkeypatch):
    monkeypatch.setenv("MLFF_TPU_FORCE_TTY", "1")
    s = ui.pass_str("ok")
    assert s.startswith("\x1b[") and s.endswith("\x1b[0m") and "ok" in s
    assert ui._visible_len(s) == 2


def test_solver_progress_convergence_fraction():
    buf = _io.StringIO()
    prog = ui.SolverProgress(tol=1e-4, label="cg-test", stream=buf)
    prog(10, 1.0, eff=100)       # r0 = 1.0 -> 0%
    prog(20, 1e-2, eff=80)       # half the log-distance -> 50%
    prog(30, 1e-4, eff=60)       # at tol -> 100%
    prog.close(converged=True)
    out = buf.getvalue()
    assert "  0%" in out and " 50%" in out and "100%" in out
    assert "[DONE] cg-test" in out
    # events carry iteration counts and residuals
    assert "it 20" in out and "1.00e-02" in out


def test_solver_progress_warn_on_unconverged():
    buf = _io.StringIO()
    prog = ui.SolverProgress(tol=1e-4, label="x", stream=buf)
    prog(5, 1.0)
    prog.close(converged=False)
    assert "[WARN]" in buf.getvalue()


def test_gen_lattice_str():
    s = ui.gen_lattice_str(np.eye(3) * 2.5)
    assert s.count("\n") == 2
    assert s.splitlines()[0].startswith("a = [")
    assert "2.5000" in s


def test_gen_mat_str_alignment():
    s = ui.gen_mat_str(np.array([[1.0, -2.25], [33.5, 0.1]]))
    lines = s.splitlines()
    assert len(lines) == 2
    # columns right-aligned: equal visible widths
    assert len(lines[0]) == len(lines[1])


def test_gen_range_str():
    assert ui.gen_range_str(0.5, 2.0) == "[0.5, 2]"


def test_wrap_and_indent():
    s = ui.wrap_str("word " * 40, width=20)
    assert all(len(line) <= 20 for line in s.splitlines())
    ind = ui.indent_str("a\nb", 3)
    assert ind == "   a\n   b"
