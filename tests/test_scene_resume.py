"""Toy-scale pytest wrapper for the EO scene pipeline kill/resume
drill (tools/scene_resume_drill.py): real subprocess death after the
'warp' stage commits, poisoned partial in sobel/, resume must skip
the committed stages, overwrite the poison, and produce bit-identical
chips.  The full-scale run is recorded in BENCH_SCALING.json."""
from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_scene_resume_drill_toy(tmp_path):
    p = subprocess.run(
        [
            sys.executable,
            os.path.join(ROOT, "tools", "scene_resume_drill.py"),
            "--drill", "--side", "4", "--tile-px", "16", "--zoom", "5",
            "--base", str(tmp_path / "drill"), "--cpus", "8",
        ],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=ROOT,
    )
    assert p.returncode == 0, p.stderr[-3000:]
    out = json.loads(p.stdout.strip().splitlines()[-1])
    assert out["pass"] is True, out
    assert out["chips_bit_identical"] is True
    assert out["resume_skip_ok"] is True
    assert set(out["resume_recomputed"]) == {"sobel", "chips"}, out
