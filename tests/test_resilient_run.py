"""tools/resilient_run.py: retry-on-TPU-worker-crash supervisor.

The wrapped-command mechanics are tested with shell stand-ins (no device
needed): crash-signature classification, checkpoint selection, retry
with --resume injection, and fail-fast on ordinary program errors.
"""

import json
import os
import subprocess
import sys

import pytest

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")
sys.path.insert(0, TOOLS)

import resilient_run as rr  # noqa: E402

RUNNER = os.path.join(TOOLS, "resilient_run.py")


def test_classify_signatures():
    assert rr.classify(
        "jax.errors.JaxRuntimeError: UNAVAILABLE: TPU worker process "
        "crashed or restarted. This can be caused by a kernel fault"
    ) is not None
    assert rr.classify("ValueError: bad flag") is None
    assert rr.classify("assert x == y\nAssertionError") is None


def test_newest_prefers_round_number(tmp_path):
    for rnd in (3, 12, 7):
        (tmp_path / f"ckpt_{rnd}.pkl").write_bytes(b"x")
    # mtime order deliberately different from round order
    os.utime(tmp_path / "ckpt_12.pkl", (0, 0))
    got = rr.newest(str(tmp_path / "ckpt_*.pkl"))
    assert got is not None and got.endswith("ckpt_12.pkl")
    assert rr.newest(str(tmp_path / "nope_*.pkl")) is None


def _run(args, cwd):
    return subprocess.run([sys.executable, RUNNER] + args,
                          capture_output=True, text=True, cwd=cwd)


@pytest.fixture
def crash_then_pass(tmp_path):
    """A script that prints a TPU-crash signature and fails until a
    sentinel exists, creating the sentinel on its first run."""
    script = tmp_path / "flaky.sh"
    script.write_text(
        "#!/bin/sh\n"
        f"if [ -f {tmp_path}/ran ]; then echo OK; exit 0; fi\n"
        f"touch {tmp_path}/ran\n"
        "echo 'UNAVAILABLE: TPU worker process crashed or restarted.' >&2\n"
        "exit 1\n"
    )
    script.chmod(0o755)
    return str(script)


def test_retry_recovers(crash_then_pass, tmp_path):
    r = _run(["--max_restarts", "2", "--backoff", "0", "--",
              crash_then_pass], cwd=str(tmp_path))
    assert r.returncode == 0, r.stdout + r.stderr
    final = json.loads(r.stdout.strip().splitlines()[-1])
    assert final["resilient_run"] == "ok" and final["restarts"] == 1


def test_program_error_fails_fast(tmp_path):
    script = tmp_path / "bad.sh"
    script.write_text("#!/bin/sh\necho 'ValueError: nope' >&2\nexit 7\n")
    script.chmod(0o755)
    r = _run(["--max_restarts", "5", "--backoff", "0", "--", str(script)],
             cwd=str(tmp_path))
    assert r.returncode == 7
    final = json.loads(r.stdout.strip().splitlines()[-1])
    assert final["resilient_run"] == "program_error"


def test_resume_injected_on_retry(tmp_path):
    (tmp_path / "ckpt_4.pkl").write_bytes(b"x")
    script = tmp_path / "echoargs.sh"
    script.write_text(
        "#!/bin/sh\n"
        f"echo \"ARGS:$@\"\n"
        f"if [ -f {tmp_path}/ran ]; then exit 0; fi\n"
        f"touch {tmp_path}/ran\n"
        "echo 'kernel fault' >&2\nexit 1\n"
    )
    script.chmod(0o755)
    r = _run(["--max_restarts", "1", "--backoff", "0",
              "--ckpt_glob", str(tmp_path / "ckpt_*.pkl"), "--",
              str(script), "--exp", "X"], cwd=str(tmp_path))
    assert r.returncode == 0, r.stdout + r.stderr
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("ARGS:")]
    assert "--resume" not in lines[0]
    assert "--resume" in lines[1] and "ckpt_4.pkl" in lines[1]
