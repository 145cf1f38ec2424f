"""Stall-watchdog supervisor (tools/supervise.py): detects a hung child,
kills its process group, restarts with --resume, and passes through clean
exits."""
import sys

from tempme_tpu.tools.supervise import run_supervised


def test_clean_exit_passes_through(tmp_path):
    rc = run_supervised([sys.executable, "-c", "print('ok')"],
                        stall_timeout=30, max_restarts=1, log=lambda *a: None)
    assert rc == 0


def test_stall_detected_and_resumed(tmp_path):
    """First run hangs silently; the restart sees the marker file (the
    'checkpoint'), honors --resume, and finishes."""
    marker = tmp_path / "state"
    prog = (
        "import sys, time, pathlib\n"
        f"m = pathlib.Path({str(marker)!r})\n"
        "if '--resume' in sys.argv and m.exists():\n"
        "    print('resumed ok', flush=True)\n"
        "    sys.exit(0)\n"
        "m.write_text('epoch0')\n"
        "print('epoch 0 done', flush=True)\n"
        "time.sleep(3600)\n"        # silent hang
    )
    rc = run_supervised([sys.executable, "-c", prog], stall_timeout=3,
                        max_restarts=2, log=lambda *a: None)
    assert rc == 0
    assert marker.exists()


def test_exit_during_sleep_is_not_a_stall(tmp_path):
    """Regression (VERDICT r4 weak #1): a child that exits 0 *during* the
    watchdog's sleep, with its last output older than stall_timeout by wake
    time, must be a success on the FIRST attempt — not declared stalled.

    Recreates the race deterministically: poll interval (3s) > stall_timeout
    (1s), child prints once and exits cleanly at ~0.5s, so at the first wake
    the beat is ~3s old and poll() returns 0 — the old code declared a stall
    here."""
    marker = tmp_path / "ran"
    prog = (
        "import sys, time, pathlib\n"
        f"m = pathlib.Path({str(marker)!r})\n"
        "m.write_text(m.read_text() + 'x' if m.exists() else 'x')\n"
        "print('starting', flush=True)\n"
        "time.sleep(0.5)\n"
        "sys.exit(0)\n"
    )
    msgs = []
    rc = run_supervised([sys.executable, "-c", prog], stall_timeout=1,
                        max_restarts=2, log=msgs.append, _poll_interval=3.0)
    assert rc == 0
    assert marker.read_text() == "x", "child must have run exactly once"
    assert not any("STALL" in m for m in msgs)


def test_gives_up_after_max_restarts():
    rc = run_supervised([sys.executable, "-c", "import sys; sys.exit(3)"],
                        stall_timeout=30, max_restarts=1,
                        resume_flag=None, log=lambda *a: None)
    assert rc == 3
