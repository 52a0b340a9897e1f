"""The CER-parity harness (scripts/eval_parity.py) must stay runnable:
its synthetic self-test builds ref/hyp Page XML roots with known error
rates and checks the reported CER and the pass/fail gate."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_eval_parity_self_test():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "eval_parity.py"),
         "--self-test"],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr + proc.stdout
    assert "self-test PASSED" in proc.stdout
