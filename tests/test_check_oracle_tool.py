"""tools/check_oracle.py name handling (VERDICT r5 #7): an unknown
requested query name must hard-error (exit 2), never produce a vacuous
"all queries match" over fewer queries than the caller intended."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_unknown_query_name_is_a_hard_error():
    r = subprocess.run(
        [sys.executable, "tools/check_oracle.py",
         "/root/testdata/sf0.001", "definitely_not_a_query"],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert r.returncode == 2
    assert "unknown query name" in r.stdout
    assert "all queries match" not in r.stdout
