"""bench.py chain preemption: the tunneled TPU is exclusive, so the
end-of-round bench must terminate a running production chain (resumable by
design) instead of blocking behind it. Verifies the kill path (script +
child), pidfile cleanup, and the stale-pidfile guard (a pid whose cmdline
lacks the expected tag — e.g. reused after a host restart — is never
signalled)."""
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench


def test_preempt_kills_chain_and_skips_stale(tmp_path, monkeypatch):
    script = tmp_path / "run_production_chain_dummy.sh"
    script.write_text("#!/bin/bash\nsleep 300\n")
    script.chmod(0o755)
    proc = subprocess.Popen(["bash", str(script)])
    time.sleep(0.3)  # let bash exec so /proc cmdline shows the script

    chain_pid = tmp_path / "chain.pid"
    chain_pid.write_text(str(proc.pid))
    stale_pid = tmp_path / "stale.pid"
    stale_pid.write_text(str(os.getpid()))  # this test runner: tag mismatch
    monkeypatch.setattr(bench, "_CHAIN_PIDFILES", {
        str(chain_pid): "run_production_chain",
        str(stale_pid): "run_production_chain",
        str(tmp_path / "absent.pid"): "evidence_watcher",
    })
    monkeypatch.setattr(time, "sleep", lambda s: None)  # skip teardown wait

    bench._preempt_chain()

    deadline = time.monotonic() + 5
    while proc.poll() is None and time.monotonic() < deadline:
        pass
    assert proc.poll() is not None, "chain script not terminated"
    kids = subprocess.run(["ps", "-o", "pid=", "--ppid", str(proc.pid)],
                          capture_output=True, text=True).stdout.split()
    assert kids == [], "chain's foreground child not terminated"
    assert not chain_pid.exists(), "consumed pidfile should be removed"
    assert stale_pid.exists(), "stale pidfile must be left alone"
