"""True multi-process distributed run (gated: slow, spawns processes).

Enable with TPU_EULER_MULTIPROC=1; scripts/multiprocess_test.py runs standalone.
"""

import os
import subprocess
import sys

import pytest


@pytest.mark.skipif(
    os.environ.get("TPU_EULER_MULTIPROC") != "1",
    reason="set TPU_EULER_MULTIPROC=1 to run the 2-process distributed test",
)
def test_two_process_distributed():
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    r = subprocess.run(
        [sys.executable, os.path.join(root, "scripts", "multiprocess_test.py"), "2"],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert r.returncode == 0, r.stdout + r.stderr
