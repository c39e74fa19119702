"""jobs/clean_submit.py end-to-end: runs, writes both sinks, and is
deterministic across re-runs (salted-hash sampling)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

from .conftest import sf_dir

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_clean_submit_runs_and_is_deterministic(tmp_path):
    out = str(tmp_path / "clean")
    cmd = [
        sys.executable,
        os.path.join(REPO, "jobs", "clean_submit.py"),
        "--input", os.path.join(sf_dir("0.001"), "documents.parquet"),
        "--output", out,
        "--sample", "0.5",
        "--shard-budget", "300",
        "--shard-buckets", "4",
        "--master", "local[4]",
    ]

    def run():
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=300, cwd=str(tmp_path)
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        return json.loads(proc.stdout.strip().splitlines()[-1])

    first = run()
    assert first["docs_in"] == 500
    assert 0 < first["docs_kept"] < 500
    assert first["n_shards"] > 0 and first["n_tokens"] > 0
    assert os.path.isdir(f"{out}/clean_docs") and os.path.isdir(f"{out}/shards")

    second = run()  # deterministic: identical summary on re-run
    assert second == first


def test_clean_submit_curation_flags(tmp_path):
    """Round-4 stages: line dedup, per-source cap, and decontamination
    compose into the job and stay deterministic across re-runs."""
    out = str(tmp_path / "clean2")
    eval_dir = str(tmp_path / "eval")
    # eval set = a copy of some documents (guaranteed 3-gram overlap)
    import duckdb

    duckdb.sql(
        f"COPY (SELECT doc_id, text FROM read_parquet("
        f"'{sf_dir('0.001')}/documents.parquet') WHERE doc_id < 5) "
        f"TO '{eval_dir}' (FORMAT PARQUET)"
    )
    cmd = [
        sys.executable,
        os.path.join(REPO, "jobs", "clean_submit.py"),
        "--input", os.path.join(sf_dir("0.001"), "documents.parquet"),
        "--output", out,
        "--sample", "0.9",
        "--shard-budget", "300",
        "--shard-buckets", "4",
        "--line-dedup-min-df", "2",
        "--max-per-source", "20",
        "--decontam-eval", eval_dir,
        "--master", "local[4]",
    ]

    def run():
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=300,
            cwd=str(tmp_path),
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        return json.loads(proc.stdout.strip().splitlines()[-1])

    first = run()
    assert first["docs_in"] == 500
    assert 0 < first["docs_kept"] < 500
    second = run()
    assert second == first
