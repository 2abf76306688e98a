"""Driver-entry regression tests.

Round 1's multi-chip artifact failed because ``dryrun_multichip`` relied
on the caller to force the CPU platform (MULTICHIP_r01.json rc=1).  This
test invokes it EXACTLY as the driver does — a bare subprocess with no
environment preparation — so that failure mode can never silently return.
"""

import os
import subprocess
import sys

def test_dryrun_multichip_bare_subprocess():
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(8): ok" in proc.stdout
