"""Round-4 regression tests: bench outlier handling, CLI guards."""

import importlib.util
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestBenchRobustTrials:
    """VERDICT r3 #5: a 46x-off tunnel stall must not inflate the spread."""

    def test_clean_trials_untouched(self):
        b = _load_bench()
        vals = iter([2.35, 2.36, 2.34, 2.355, 2.345])
        kept, disc = b.robust_trials(lambda s: next(vals), 5, "t")
        assert len(kept) == 5 and disc == []

    def test_outlier_retried_and_recovered(self):
        b = _load_bench()
        vals = iter([2.35, 0.05, 2.36, 2.34, 2.35, 2.355])
        kept, disc = b.robust_trials(lambda s: next(vals), 5, "t")
        assert len(kept) == 5
        assert disc == [0.05]
        assert all(abs(k - 2.35) < 0.05 for k in kept)

    def test_outlier_retry_also_off_dropped(self):
        b = _load_bench()
        vals = iter([2.35, 0.05, 2.36, 2.34, 2.35, 0.06])
        kept, disc = b.robust_trials(lambda s: next(vals), 5, "t")
        assert len(kept) == 4
        assert disc == [0.05, 0.06]

    def test_all_divergent_falls_back_to_raw(self):
        # pathological: no two trials agree — report raw rather than empty
        b = _load_bench()
        seq = [1.0, 2.0, 8.0, 16.0, 64.0] + [100.0] * 10
        vals = iter(seq)
        kept, disc = b.robust_trials(lambda s: next(vals), 5, "t")
        assert len(kept) >= 1


class TestGenerateKarrasGuard:
    """ADVICE r3: pndm + --karras_sigmas must fail BEFORE the model load."""

    @pytest.mark.parametrize("sched", ["ddim", "pndm"])
    def test_pre_load_rejection(self, sched):
        r = subprocess.run(
            [sys.executable, "-c",
             "from photoverse_tpu.cli.generate import main; "
             f"main(['--input_image_path', 'x.png', '--scheduler', '{sched}',"
             " '--karras_sigmas'])"],
            capture_output=True, text=True, timeout=120, cwd=REPO,
        )
        assert r.returncode != 0
        assert "karras_sigmas is invalid" in r.stderr
        # SystemExit fires before any model/jax heavy lifting
        assert "Traceback" not in r.stderr
