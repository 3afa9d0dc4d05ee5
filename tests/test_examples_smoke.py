"""examples/cli_smoke.sh must keep executing end-to-end: train → resume
→ test (greedy/beam) → transcribe → lm_train → LM-rescored test through
the real CLIs (drop-in flag contract, reference README.md:44-97)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_cli_smoke_script(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        ["bash", os.path.join(REPO, "examples", "cli_smoke.sh"),
         str(tmp_path / "work")],
        capture_output=True, text=True, env=env, timeout=1200)
    sys.stdout.write(r.stdout[-2000:])
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    assert "SMOKE OK" in r.stdout