"""The production chain's failure-diagnosability contract (VERDICT r4
weak #3 / next-round item 4): a failed attempt must leave rc + the log
tail it produced in chain.log, so a crash loop is attributable post-hoc
from chain.log alone.

The chain scripts are plain bash; these tests extract the run()/run_chunk()
helpers from the CURRENT chain script by name and exercise them against a
scratch LOGDIR, so the contract is tested on the shipped text, not a copy.
"""

import os
import re
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHAIN = os.path.join(REPO, "scripts", "run_production_chain4.sh")


def _extract_fn(name):
    text = open(CHAIN).read()
    m = re.search(rf"^{name}\(\) \{{\n.*?^\}}", text,
                  re.MULTILINE | re.DOTALL)
    assert m, f"{name}() not found in {CHAIN}"
    return m.group(0)


def _bash(logdir, body):
    script = (f"set -u\nLOGDIR={logdir}\n"
              + _extract_fn("run") + "\n" + _extract_fn("run_chunk")
              + "\n" + body)
    return subprocess.run(["bash", "-c", script], capture_output=True,
                          text=True, cwd=REPO)


def test_failed_attempt_records_rc_and_tail(tmp_path):
    log = str(tmp_path)
    r = _bash(log, "run boom bash -c 'echo start; echo oops >&2; exit 3'")
    assert r.returncode == 0, r.stderr
    chain = open(os.path.join(log, "chain.log")).read()
    assert "boom FAILED rc=3" in chain
    # the attempt's appended output (stdout+stderr both land in the log)
    assert "[boom tail] start" in chain
    assert "[boom tail] oops" in chain
    assert not os.path.exists(os.path.join(log, "boom.done"))


def test_failed_attempt_with_no_output_says_so(tmp_path):
    log = str(tmp_path)
    r = _bash(log, "run silent bash -c 'exit 7'")
    assert r.returncode == 0, r.stderr
    chain = open(os.path.join(log, "chain.log")).read()
    assert "silent FAILED rc=7" in chain
    assert "died at startup" in chain


def test_tail_is_per_attempt_not_whole_log(tmp_path):
    """A retry must log only ITS OWN appended lines, not the previous
    attempt's — the whole point of diagnosing a crash loop."""
    log = str(tmp_path)
    body = ("run flaky bash -c 'echo first-attempt; exit 1'\n"
            "rm -f {0}/flaky.done\n"
            "run flaky bash -c 'echo second-attempt; exit 2'\n").format(log)
    r = _bash(log, body)
    assert r.returncode == 0, r.stderr
    chain = open(os.path.join(log, "chain.log")).read()
    second = chain.split("FAILED rc=2")[1]
    assert "[flaky tail] second-attempt" in second
    assert "first-attempt" not in second


def test_success_writes_done_marker(tmp_path):
    log = str(tmp_path)
    r = _bash(log, "run good bash -c 'echo fine'")
    assert r.returncode == 0, r.stderr
    assert os.path.exists(os.path.join(log, "good.done"))
    chain = open(os.path.join(log, "chain.log")).read()
    assert "good DONE" in chain


def test_run_chunk_never_writes_done_marker(tmp_path):
    log = str(tmp_path)
    r = _bash(log, "run_chunk part bash -c 'echo ok'")
    assert r.returncode == 0, r.stderr
    assert not os.path.exists(os.path.join(log, "part.done"))
    chain = open(os.path.join(log, "chain.log")).read()
    assert "part chunk DONE" in chain
