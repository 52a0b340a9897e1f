"""Timing registry + jax.profiler capture (SURVEY.md §5.1)."""

import os

import jax
import jax.numpy as jnp

from pero_ocr_tpu.utils.timing import (
    TimingRegistry,
    jax_profile,
)


class TestTimingRegistry:
    def test_accumulates_and_reports(self):
        reg = TimingRegistry()
        with reg.timer("stage/a"):
            pass
        with reg.timer("stage/a"):
            pass
        reg.add("stage/b", 0.5, calls=3)
        stats = reg.as_dict()
        assert stats["stage/a"]["calls"] == 2
        assert stats["stage/b"]["total_seconds"] == 0.5
        report = reg.report()
        assert "stage/a" in report and "stage/b" in report
        reg.reset()
        assert reg.report() == "no timed stages"


class TestJaxProfile:
    def test_noop_without_dir(self):
        with jax_profile(None):
            pass
        with jax_profile(""):
            pass

    def test_writes_trace(self, tmp_path):
        """A trace must actually land on disk so --profile (parse_folder)
        and bench --profile give per-op attribution (VERDICT r1 #10)."""
        log_dir = str(tmp_path / "trace")
        with jax_profile(log_dir):
            x = jnp.ones((64, 64))
            (x @ x).block_until_ready()
        found = [
            os.path.join(root, f)
            for root, _, files in os.walk(log_dir)
            for f in files
        ]
        assert found, "no profiler artifacts written"
