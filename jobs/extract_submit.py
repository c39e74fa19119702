"""Production entrypoint for the extraction job.

Submit::

    python -m studiocr_spark.session  # or directly:
    spark-submit --master yarn \
      --py-files studiocr_spark.zip \
      --conf spark.sql.adaptive.enabled=true \
      --conf spark.executorEnv.OMP_THREAD_LIMIT=1 \
      jobs/extract_submit.py \
      --input s3://bucket/pages --output s3://bucket/ocr \
      --n-buckets 4096 --backend tesseract

Build the zip with ``python -c "from studiocr_spark.session import
build_pyfiles_zip; print(build_pyfiles_zip('studiocr_spark.zip'))"``.

The job is resumable: re-submitting with the same --output continues from
the completion manifest (streaming/incremental.py); crashed buckets are
reprocessed idempotently via dynamic partition overwrite.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# under spark-submit, --py-files puts the package on the driver path; for
# a bare `python jobs/extract_submit.py` run, the repo root does
try:
    import studiocr_spark  # noqa: F401
except ImportError:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="studiocr_spark extract job")
    ap.add_argument("--input", required=True, help="pages table path")
    ap.add_argument("--output", required=True, help="output root")
    ap.add_argument("--backend", default="tesseract",
                    choices=["tesseract", "bitmap"])
    ap.add_argument("--n-buckets", type=int, default=1024,
                    help="checkpoint/lineage buckets (>= 10 x executors)")
    ap.add_argument("--build-index", action="store_true",
                    help="also build the postings inverted index")
    ap.add_argument("--term-buckets", type=int, default=256)
    ap.add_argument("--master", default=None,
                    help="override master (default: from spark-submit)")
    args = ap.parse_args(argv)

    from studiocr_spark.operators.index import build_postings, write_postings
    from studiocr_spark.session import get_spark
    from studiocr_spark.streaming.incremental import (
        pending_buckets,
        run_checkpointed_extract,
    )

    spark = get_spark(app_name="studiocr-extract", master=args.master)
    pages = spark.read.parquet(args.input)

    manifest = run_checkpointed_extract(
        spark, pages, args.output,
        n_buckets=args.n_buckets, backend=args.backend,
    )
    still_pending = pending_buckets(spark, args.output, args.n_buckets)
    if manifest is not None:
        stats = manifest.groupBy().sum("n_urls", "n_pages", "n_blocks").first()
        print(json.dumps({
            "completed_buckets": manifest.count(),
            "n_urls": stats[0], "n_pages": stats[1], "n_blocks": stats[2],
            "pending_buckets": len(still_pending),
        }))
    else:
        print(json.dumps({"completed_buckets": 0,
                          "pending_buckets": len(still_pending),
                          "note": "nothing pending; already complete"}))

    if args.build_index and not still_pending:
        blocks = spark.read.parquet(f"{args.output}/ocr_blocks")
        write_postings(
            build_postings(blocks), f"{args.output}/postings",
            term_buckets=args.term_buckets,
        )
        print(json.dumps({"postings": "built"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
