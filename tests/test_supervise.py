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


def test_gives_up_after_max_restarts():
    rc = run_supervised([sys.executable, "-c", "import sys; sys.exit(3)"],
                        stall_timeout=30, max_restarts=1,
                        resume_flag=None, log=lambda *a: None)
    assert rc == 3
