"""In-suite run of the differential scoring referee (scripts/referee_scoring.py).

Compiles the reference crate verbatim and compares full query sessions —
error classes, retrieval id lists, and every Hit at bit level — between the
reference engine and core/oracle.py.  Skips cleanly when rustc or the
reference sources are unavailable (the script itself exits 0 with a
"skipped" JSON in that case; we surface it as a pytest skip instead so the
suite report is honest about what ran).

A 10-corpus run (~15 s incl. the one-time rustc build) is the in-suite
smoke; the full evidence sweep is 200 corpora / 11,080 sessions, recorded
in COVERAGE.md and re-runnable on demand.
"""

import json
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
SCRIPT = REPO / "scripts" / "referee_scoring.py"
REF = Path("/root/reference/src/lib.rs")


@pytest.mark.skipif(
    shutil.which("rustc") is None or not REF.exists(),
    reason="rustc or reference sources unavailable",
)
def test_scoring_referee_smoke():
    r = subprocess.run(
        [sys.executable, str(SCRIPT), "10"],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    stats = json.loads(r.stdout.strip().splitlines()[-1])
    if "skipped" in stats:
        pytest.skip(stats["skipped"])
    assert stats["pass"], stats
    assert stats["mismatched_sessions"] == 0, stats
    assert stats["queries"] > 400  # 10 corpora x 8 configs x 4-10 queries
