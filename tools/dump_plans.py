"""Dump .explain('formatted') for registry entries to plans/r11/.

Usage: python tools/dump_plans.py <suffix> <query> [query ...]

Writes plans/r11/<query>_<suffix>.txt under the CURRENT repo (cwd's
repo root, next to this script's parent). Used to commit the
before/after plan evidence the optimization round deliverable asks for:
run once from a worktree pinned at the pre-change commit with suffix
'before', once from HEAD with suffix 'after'.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.profile_query import build_session  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    out_dir = os.environ.get(
        "PLANS_OUT",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "plans",
            "r11",
        ),
    )
    os.makedirs(out_dir, exist_ok=True)
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session()
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
