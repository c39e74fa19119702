"""Generate BENCH/PLANS.md: physical-plan vitals for every gate entry.

One row per ``__spark_entry__.queries()`` entry: shuffle-exchange count,
join strategies chosen, whether any filter pushed into a parquet scan,
and hazard flags (CartesianProduct, per-row PythonUDF in the plan). The
table is the at-a-glance answer to "would this plan survive 100x" — and
a diffable artifact, so a regression that adds a shuffle or drops a
broadcast shows up in review even before the plan-pin tests run.

Usage: python tools/plan_report.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    # plan inspection must not execute the ANN entries' oracle-dump
    # writes (round-5 ADVICE: an eager dump here could interleave with
    # a concurrent check_oracle run) — and the skipped variant has the
    # same physical plan for the operator under inspection
    os.environ["SPARK_GRAFT_ANN_SKIP_DUMP"] = "1"

    import __spark_entry__ as entry
    from studiocr_spark.plans.explain import (
        formatted_plan,
        pushed_filters,
        shuffle_exchanges,
    )
    from studiocr_spark.session import get_spark

    spark = get_spark(
        app_name="plan-report", master="local[4]", shuffle_partitions=4
    )
    rows = []
    for name, fn in entry.queries().items():
        try:
            df = fn(spark, sf_dir)
            plan = formatted_plan(df)
        except Exception as exc:  # a broken entry must be visible, not skipped
            rows.append((name, "ERROR", "", "", f"{type(exc).__name__}"))
            continue
        n_ex = len(shuffle_exchanges(df))
        joins = sorted(
            {
                m
                for m in re.findall(
                    r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
                    r"BroadcastNestedLoopJoin|CartesianProduct)\b",
                    plan,
                )
            }
        )
        pushed = "yes" if any(
            p not in ("[]", "") for p in pushed_filters(df)
        ) else ""
        hazards = []
        if "CartesianProduct" in plan:
            hazards.append("CARTESIAN")
        # per-row Python UDFs are the slow path; Arrow batches are fine
        if re.search(r"\bBatchEvalPython\b", plan):
            hazards.append("ROW-PYUDF")
        rows.append(
            (name, str(n_ex), "+".join(j.replace("Join", "") for j in joins),
             pushed, " ".join(hazards))
        )

    stamp = datetime.now(timezone.utc).isoformat()
    out = [
        "# BENCH/PLANS — physical-plan vitals per gate entry",
        "",
        f"Generated {stamp} by tools/plan_report.py at {sf_dir}.",
        "Exchanges = shuffle exchanges in the submitted plan (broadcast",
        "exchanges excluded); hazards flag CartesianProduct and",
        "row-at-a-time Python UDFs (Arrow/pandas UDFs do not flag).",
        "Lazily-checkpointed subplans (minhash/simhash bands, candidate",
        "pairs) hide their upstream exchanges from explain — their true",
        "counts are pinned in tests/test_plans.py instead.",
        "",
        "| entry | exchanges | joins | pushdown | hazards |",
        "|---|---|---|---|---|",
    ]
    for name, n_ex, joins, pushed, hazards in rows:
        out.append(f"| {name} | {n_ex} | {joins} | {pushed} | {hazards} |")
    path = os.path.join(REPO, "BENCH", "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote {path} ({len(rows)} entries)")
    bad = [r for r in rows if r[4] or r[1] == "ERROR"]
    for r in bad:
        print("HAZARD", r)
    spark.stop()


if __name__ == "__main__":
    main()
