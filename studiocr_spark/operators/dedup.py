"""Deduplication family for web-scale corpora.

All variants are pure DataFrame compositions (no UDFs), deterministic,
and DuckDB-expressible for the oracle gate:

- exact: content-identity grouping (keep the smallest doc_id)
- MinHash + LSH: word-shingle -> per-seed min-digest signature -> banded
  bucket join -> exact-Jaccard verification of candidates
- SimHash: per-bit majority over token digests -> near-dup by Hamming
  distance
- n-gram Jaccard: inverted shingle join with a document-frequency cap on
  hot shingles (the skew guard), then exact Jaccard

Scale notes: LSH band join and shingle join are the shuffle-heavy steps;
both shuffle on digest-like keys (uniform by construction) except real-
world hot shingles, which the DF cap drops explicitly (and ``log()``-ably)
rather than letting one reducer melt. Signatures use md5 (stable across
engines) rather than xxhash64 (Spark-private seed mixing).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import round6, words_of


def exact_duplicates(
    docs: DataFrame, text_col: str = "text", hash_first: bool = False
) -> DataFrame:
    """(doc_id, canonical_id, is_duplicate): group by exact content.

    Hash-groupBy on the text; canonical = min doc_id of the group.

    ``hash_first`` is the 100 TB shape: the groupBy and join shuffle
    32-byte md5 digests instead of multi-KB documents (~100x less
    shuffle for web pages). Duplicate-by-digest stands in for
    duplicate-by-text — at md5 strength the corpus-wide collision odds
    are ~2^-64 even at 10^10 documents, which is how production exact
    dedup (e.g. CCNet-style pipelines) runs; a paranoid deployment can
    re-verify inside digest groups with the near-dup verifier.
    """
    if hash_first:
        hashed = docs.select("doc_id", F.md5(F.col(text_col)).alias("_h"))
        canon = hashed.groupBy("_h").agg(
            F.min("doc_id").alias("canonical_id")
        )
        return (
            hashed.join(canon, "_h")
            .select(
                "doc_id",
                "canonical_id",
                (F.col("doc_id") != F.col("canonical_id")).alias(
                    "is_duplicate"
                ),
            )
        )
    canon = docs.groupBy(text_col).agg(F.min("doc_id").alias("canonical_id"))
    return (
        docs.join(canon, text_col)
        .select(
            "doc_id",
            "canonical_id",
            (F.col("doc_id") != F.col("canonical_id")).alias("is_duplicate"),
        )
    )


def keep_canonical(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    digest: bool = True,
) -> DataFrame:
    """Filter ``docs`` to one canonical row (min id) per exact content —
    the in-pipeline form of exact dedup.

    ``exact_duplicates`` labels every row (groupBy digest + join back =
    two exchanges); a cleaning pipeline only needs the KEPT rows, which
    a single window does: min(id) over (partition by digest), keep rows
    where id == min. ONE exchange, no join, and the digest (32-byte md5)
    is the partition key so the shuffle distributes uniformly no matter
    how skewed the duplicate clusters are.

    ``digest=False`` treats ``text_col`` as an already-computed content
    key (e.g. a pre-projected md5) — use it to drop the raw text BEFORE
    the window so multi-KB documents never ride the exchange when the
    caller doesn't need them downstream.
    """
    from pyspark.sql import Window

    key = F.md5(F.col(text_col)) if digest else F.col(text_col)
    w = Window.partitionBy(key)
    return (
        docs.withColumn("_canon_id", F.min(id_col).over(w))
        .filter(F.col(id_col) == F.col("_canon_id"))
        .drop("_canon_id")
    )


def word_shingles(text_col: Column, n: int = 2) -> Column:
    """Distinct word n-gram shingles of a text (expression form).

    Kept for single-column composition; the bulk path is
    :func:`shingle_table`, whose Arrow shingler produces the identical
    shingle set ~2-10x faster (the transform/slice/array_join chain here
    is interpreted per element — HOFs are CodegenFallback)."""
    words = words_of(text_col)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(words) - (n - 1), F.lit(1))),
            lambda i: F.array_join(F.slice(words, i, n), " "),
        )
    )


_ASCII_WS = None  # compiled lazily; Java regex \s is ASCII-only


def _py_words(t: str) -> list[str]:
    """Tokenization mirroring ``words_of`` EXACTLY: Java's ``\\s`` is
    ``[ \\t\\n\\x0B\\f\\r]`` (ASCII only), while Python's ``str.split()``
    also splits on unicode whitespace (U+00A0 etc.) — a silent
    divergence on non-ASCII corpora. Split on the Java class, drop
    empties."""
    global _ASCII_WS
    if _ASCII_WS is None:
        import re

        _ASCII_WS = re.compile("[ \t\n\x0b\f\r]+")
    return [w for w in _ASCII_WS.split(t) if w]


def _py_ngrams(t: str | None, n: int) -> list[str]:
    """ALL word n-grams in order (duplicates kept) — the multiset form
    repetition statistics need; :func:`_py_shingles` is its dedup."""
    if t is None:
        return []
    w = _py_words(t)
    if n == 2:
        # fast path for the dominant bigram case: zip + concat beats
        # per-position slice+join ~2x and is semantically identical
        # (len>=2 -> pairs; len 1 -> the word; len 0 -> one '' shingle,
        # exactly what the generic branch yields via w[0:2])
        if len(w) >= 2:
            return [a + " " + b for a, b in zip(w, w[1:])]
        return [w[0] if w else ""]
    hi = max(len(w) - (n - 1), 1)
    return [" ".join(w[i : i + n]) for i in range(hi)]


def _py_shingles(t: str | None, n: int) -> list[str]:
    """Distinct word n-gram shingles, Python form (:func:`_py_words`
    tokens, ``dict.fromkeys`` mirrors ``array_distinct``) — verified
    row-identical to the :func:`word_shingles` expression on the
    sf0.1 corpus AND on an ASCII/unicode edge-case corpus (pytest)."""
    return list(dict.fromkeys(_py_ngrams(t, n)))


def shingle_table(docs: DataFrame, text_col: str = "text", n: int = 2) -> DataFrame:
    """(doc_id, shingle) exploded distinct shingles.

    Arrow pandas-UDF shingler (:func:`_py_shingles`), ~2x cold / ~10x
    warm vs the expression form: 1.5M interpreted slice+array_join
    evaluations vs one batched Python pass per Arrow batch."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def _shingles(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: _py_shingles(t, n))

    return docs.select(
        "doc_id", F.explode(_shingles(text_col)).alias("shingle")
    )


# universal-hash family for minhash: v_j(s) = (a_j * x(s) + b_j) mod P,
# where x(s) = first 32 bits of md5(s). P = largest prime < 2^32; a_j
# fits 28 bits so a*x + b < 2^61 stays exact in BIGINT arithmetic in
# Spark, DuckDB, AND numpy int64 — the whole family is SQL-transcribable
# for the oracle. One md5 per DISTINCT shingle replaces the round-2
# md5-per-(seed, shingle) scheme: ~12M hashlib calls -> ~1.5M at sf0.1
# (num_hashes x cheaper), with the per-seed mins derived by a numpy
# broadcast multiply instead of more hashing.
MH_PRIME = 4294967291


def minhash_params(num_hashes: int) -> tuple[list[int], list[int]]:
    """Deterministic (a, b) coefficients per seed, derived from md5 of
    fixed strings — no RNG state, identical across engines and runs
    (the oracle SQL embeds the same integers)."""
    import hashlib

    a = [
        int(hashlib.md5(f"mh-a-{j}".encode()).hexdigest()[:7], 16) or 1
        for j in range(num_hashes)
    ]
    b = [
        int(hashlib.md5(f"mh-b-{j}".encode()).hexdigest()[:8], 16)
        for j in range(num_hashes)
    ]
    return a, b


def _minhash_array_udf(n: int, num_hashes: int):
    """Factory for the Arrow minhash UDF: text -> array<long> signature
    in seed order (closure factory per the repo lambda-arity rule)."""
    import hashlib

    import numpy as np
    from pyspark.sql.functions import pandas_udf

    a_co, b_co = minhash_params(num_hashes)

    @pandas_udf("array<long>")
    def _mins(texts: pd.Series) -> pd.Series:
        # Round-4 vectorization of the per-shingle Python loop: one
        # factorize over the batch's flattened shingles (C speed)
        # replaces per-shingle dict lookups, ONE md5 per batch-distinct
        # shingle (same call count as the old per-batch cache), then a
        # single (num_hashes x total) broadcast-affine + segmented
        # minimum.reduceat — no per-doc numpy allocs. hexdigest parity
        # and exact-int64 arithmetic are unchanged, so the DuckDB
        # oracle's hash compare still passes bit-for-bit.
        A = np.array(a_co, dtype=np.int64)[:, None]
        B = np.array(b_co, dtype=np.int64)[:, None]
        sh = [_py_shingles(t, n) for t in texts]
        lens = np.array([len(s) for s in sh], dtype=np.int64)
        flat: list[str] = []
        for s in sh:
            flat.extend(s)
        if flat:
            codes, uniques = pd.factorize(
                pd.Series(flat, dtype="object"), use_na_sentinel=False
            )
            xu = np.fromiter(
                (
                    int(hashlib.md5(u.encode()).hexdigest()[:8], 16)
                    for u in uniques
                ),
                dtype=np.int64,
                count=len(uniques),
            )
            H = (A * xu[codes] + B) % MH_PRIME
            seg = lens[lens > 0]
            starts = np.concatenate(
                ([0], np.cumsum(seg)[:-1])
            ).astype(np.int64)
            mins = np.minimum.reduceat(H, starts, axis=1)
        out: list[list[int] | None] = []
        j = 0
        for ln in lens:
            if ln == 0:
                # null array -> posexplode drops the doc, matching the
                # explode-form behavior for null text
                out.append(None)
            else:
                out.append(mins[:, j].tolist())
                j += 1
        return pd.Series(out, dtype="object")

    return _mins


def minhash_signatures(
    docs: DataFrame, text_col: str = "text", n: int = 2, num_hashes: int = 8
) -> DataFrame:
    """(doc_id, seed, minhash): per-seed min over the universal-hash
    family applied to md5-prefixed shingle values (see MH_PRIME note).

    Shape: ONE narrow Arrow pass per doc (one hashlib md5 per distinct
    shingle — cached per Arrow batch since shingles repeat heavily —
    then an (num_hashes x n_shingles) numpy broadcast for the mins),
    then posexplode to rows — zero shuffles. The explode -> md5
    expression -> grouped-min shape shuffles every shingle row and runs
    num_hashes interpreted md5s per shingle; an array_min-over-transform
    HOF re-evaluates the shingle array once per seed (no CSE across
    output columns). hashlib hexdigests are byte-identical to
    Spark's/DuckDB's md5 and the affine arithmetic is exact int64, so
    the oracle hash-parity is preserved.
    """
    mins = docs.select(
        "doc_id", _minhash_array_udf(n, num_hashes)(text_col).alias("mh")
    )
    return mins.select(
        "doc_id",
        F.posexplode("mh").alias("seed", "minhash"),
    )


def minhash_band_table(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 2,
    num_hashes: int = 8,
    rows_per_band: int = 2,
) -> DataFrame:
    """(doc_id, band, band_key) — LSH band keys with ZERO shuffles.

    The round-4 shape exploded signatures to (doc_id, seed, minhash)
    rows and re-grouped them per (doc_id, band) to build band keys —
    a full shuffle spent undoing an explode. The minhash UDF already
    returns the per-doc signature as ONE array in seed order, so each
    band key is just ``array_join(slice(mh, band*rpb+1, rpb), ',')`` —
    a per-row projection. Identical keys to the grouped form (the
    group-by sorted by seed; slice order IS seed order), pinned by
    pytest equality against :func:`minhash_signatures` + grouping.
    """
    mins = docs.select(
        "doc_id", _minhash_array_udf(n, num_hashes)(text_col).alias("mh")
    )
    return _band_keys_from_mh(mins, num_hashes, rows_per_band)


def _band_keys_from_mh(
    mins: DataFrame, num_hashes: int, rows_per_band: int
) -> DataFrame:
    """(doc_id, band, band_key) from a (doc_id, mh array) frame — the
    per-row band-key projection shared by minhash_band_table and the
    fused minhash_lsh_dedup path."""
    import math

    n_bands = math.ceil(num_hashes / rows_per_band)
    keys = F.array(*[
        F.array_join(
            F.transform(
                F.slice("mh", i * rows_per_band + 1, rows_per_band),
                lambda c: c.cast("string"),
            ),
            ",",
        )
        for i in range(n_bands)
    ])
    # null signature (null/empty text) contributes no bands — matches
    # the exploded form, where posexplode drops the doc
    return mins.filter(F.col("mh").isNotNull()).select(
        "doc_id", F.posexplode(keys).alias("band", "band_key")
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    rows_per_band: int = 2,
    checkpoint_banded: bool = True,
) -> DataFrame:
    """(doc_a, doc_b) sharing at least one LSH band bucket.

    Band key = ordered concat of the band's minhashes; self-equi-join on
    (band, key) — uniform md5 keys, so the shuffle is skew-free by
    construction.

    Both self-join sides are the SAME banded table, so its subplan (the
    Arrow minhash UDF + band aggregate) would execute twice inside one
    action; the lazy localCheckpoint (round-4) computes it once —
    measured ~1s off dedup_minhash_lsh at sf0.1. Same escape hatch
    rationale as minhash_lsh_dedup's checkpoint_candidates.
    """
    banded = (
        signatures.withColumn(
            "band", (F.col("seed") / rows_per_band).cast("int")
        )
        .groupBy("doc_id", "band")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seed", "minhash"))),
                    lambda s: s["minhash"].cast("string"),
                ),
                ",",
            ).alias("band_key")
        )
    )
    return _pairs_from_banded(banded, checkpoint_banded)


def _pairs_from_banded(
    banded: DataFrame, checkpoint_banded: bool = True
) -> DataFrame:
    """Distinct (doc_a, doc_b) from a (doc_id, band, band_key) table via
    the skew-free self-equi-join; the banded side is lazily checkpointed
    so its subplan (the Arrow UDF) runs once, not once per side."""
    if checkpoint_banded:
        banded = banded.localCheckpoint(eager=False)
    a = banded.select("band", "band_key", F.col("doc_id").alias("doc_a"))
    b = banded.select("band", "band_key", F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def _sig_and_shingles_udf(n: int, num_hashes: int):
    """Factory: text -> struct(mh: array<long>, shs: array<long>) — the
    minhash signature AND the 60-bit hashed shingle array from ONE
    tokenize + ONE md5 per batch-distinct shingle (the full hexdigest
    serves both: chars [0:8) are the signature's universal-hash input,
    chars [0:15) the verify identity). Fuses what used to be two
    separate Arrow passes over the same documents (signatures for
    banding, hashes for the arrays verify). Values are bit-identical to
    the standalone UDFs — pinned by pytest equality."""
    import hashlib

    import numpy as np
    from pyspark.sql.functions import pandas_udf

    a_co, b_co = minhash_params(num_hashes)

    @pandas_udf("struct<mh: array<long>, shs: array<long>>")
    def _combo(texts: pd.Series) -> pd.DataFrame:
        A = np.array(a_co, dtype=np.int64)[:, None]
        B = np.array(b_co, dtype=np.int64)[:, None]
        sh = [_py_shingles(t, n) for t in texts]
        lens = np.array([len(s) for s in sh], dtype=np.int64)
        flat: list[str] = []
        for s in sh:
            flat.extend(s)
        if flat:
            codes, uniques = pd.factorize(
                pd.Series(flat, dtype="object"), use_na_sentinel=False
            )
            hexes = [hashlib.md5(u.encode()).hexdigest() for u in uniques]
            xu = np.fromiter(
                (int(h[:8], 16) for h in hexes),
                dtype=np.int64, count=len(hexes),
            )
            hu = np.fromiter(
                (int(h[:15], 16) for h in hexes),
                dtype=np.int64, count=len(hexes),
            )
            H = (A * xu[codes] + B) % MH_PRIME
            seg = lens[lens > 0]
            starts = np.concatenate(([0], np.cumsum(seg)[:-1])).astype(
                np.int64
            )
            mins = np.minimum.reduceat(H, starts, axis=1)
            hc = hu[codes]
        # StructType pandas UDFs return a DataFrame (one column per
        # field). Build plain Python lists of .tolist() values — object
        # Series assignment of ndarray cells corrupts (repo rule).
        mh_out: list[list[int] | None] = []
        shs_out: list[list[int]] = []
        j = 0
        pos = 0
        for ln in lens:
            shs_out.append(hc[pos : pos + ln].tolist() if ln else [])
            pos += ln
            if ln == 0:
                mh_out.append(None)
            else:
                mh_out.append(mins[:, j].tolist())
                j += 1
        return pd.DataFrame(
            {
                "mh": pd.Series(mh_out, dtype="object"),
                "shs": pd.Series(shs_out, dtype="object"),
            }
        )

    return _combo


def _hashed_shingle_array_udf(n: int):
    """Factory: text -> array<long> of the doc's DISTINCT shingles
    hashed to 60-bit ints (first 15 hex chars of md5 — positive int64).

    The hash is the oracle-transcribable identity used by the "arrays"
    verify: DuckDB computes CAST('0x'||substr(md5(shingle),1,15) AS
    BIGINT) over the same shingles, so intersection counts agree
    bit-for-bit. A 60-bit collision between two different shingles of
    one compared pair (~2^-60 per shingle pair) would perturb the count
    identically in BOTH engines; a within-doc collision could skew the
    |A|+|B|-|A∩B| union arithmetic — probability ~1e-14 per doc,
    accepted and documented rather than defended with wider hashes.
    """
    import hashlib

    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def _hashes(texts: pd.Series) -> pd.Series:
        sh = [_py_shingles(t, n) for t in texts]
        flat: list[str] = []
        for s in sh:
            flat.extend(s)
        # an all-None/empty batch leaves flat empty: hc must still exist
        # for the (empty-slice) output loop below
        hc = np.empty(0, dtype=np.int64)
        if flat:
            codes, uniques = pd.factorize(
                pd.Series(flat, dtype="object"), use_na_sentinel=False
            )
            hu = np.fromiter(
                (
                    int(hashlib.md5(u.encode()).hexdigest()[:15], 16)
                    for u in uniques
                ),
                dtype=np.int64,
                count=len(uniques),
            )
            hc = hu[codes]
        out: list[list[int]] = []
        j = 0
        for s in sh:
            k = len(s)
            out.append(hc[j : j + k].tolist())
            j += k
        return pd.Series(out, dtype="object")

    return _hashes


def _candidate_docs(pairs: DataFrame) -> DataFrame:
    """Distinct doc ids appearing on either side of the pair list —
    only these are shingled at all: semi-join the BASE docs before the
    shingle UDF (candidates are a sparse subset of the corpus, and
    Catalyst cannot push a filter into a pandas UDF — filtering after
    the UDF still pays the full-corpus shingling)."""
    return (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame,
    docs: DataFrame,
    text_col: str = "text",
    n: int = 2,
    threshold: float = 0.5,
    method: str = "counts",
    checkpoint_shingles: bool = True,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs; keep >= threshold.

    (doc_a, doc_b, jaccard). Two shapes, same result:

    - ``method="counts"`` (default — the LONG-document scale shape):
      |A∩B| comes from an equi-join of the exploded distinct-shingle
      table restricted to candidate pairs, and |A∪B| = |A| + |B| -
      |A∩B| — no per-doc shingle ARRAYS are ever materialized or
      shipped, so a 10^5-shingle document costs rows, not a wide array
      in every pair row. A pair with zero shared shingles drops out of
      the join, which is correct for any threshold > 0.
    - ``method="arrays"`` (the SHORT-document fast path): each
      candidate doc's distinct shingles become one sorted int64 hash
      array (:func:`_hashed_shingle_array_udf`), the two arrays join
      onto each pair, and an Arrow UDF counts the intersection. Two
      narrow joins + one vectorized pass instead of a |pairs| x
      |shingles/doc| row fan-out — measured ~25% faster end-to-end on
      the 8-60-word bench corpus. Per-pair cost (and shuffle width) is
      O(shingles/doc), so prefer "counts" when documents are large or
      unbounded.

    ``checkpoint_shingles`` lazily checkpoints the shingle/array table,
    which feeds three downstream consumers (sizes + both join sides in
    "counts"; both join sides in "arrays") — without it the Arrow
    shingler's subplan runs once per consumer (the repo's
    twice-referenced-subplan rule). False keeps the plan visible for
    plan-pin tests.
    """
    if method == "arrays":
        return _jaccard_verify_arrays(
            pairs, docs, text_col, n, threshold, checkpoint_shingles
        )
    if method != "counts":
        raise ValueError(f"method must be 'counts' or 'arrays', got {method!r}")
    cand_docs = _candidate_docs(pairs)
    sh = shingle_table(
        docs.join(cand_docs, "doc_id", "left_semi"), text_col, n
    )  # distinct (doc_id, shingle) of candidate docs only
    if checkpoint_shingles:
        sh = sh.localCheckpoint(eager=False)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    shared = (
        pairs.join(a, "doc_a")
        .join(b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("shared"))
    )
    out = (
        shared.join(
            sizes.select(F.col("doc_id").alias("doc_a"),
                         F.col("n_sh").alias("n_a")), "doc_a"
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"),
                         F.col("n_sh").alias("n_b")), "doc_b"
        )
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("shared")
                / (F.col("n_a") + F.col("n_b") - F.col("shared"))
            ).alias("jaccard"),
        )
    )
    return out.filter(F.col("jaccard") >= threshold).select(
        "doc_a", "doc_b", round6(F.col("jaccard")).alias("jaccard")
    )


def _jaccard_verify_arrays(
    pairs: DataFrame,
    docs: DataFrame,
    text_col: str,
    n: int,
    threshold: float,
    checkpoint_shingles: bool,
    arrs: DataFrame | None = None,
) -> DataFrame:
    """The "arrays" verify shape (see :func:`jaccard_verify`).

    ``arrs`` overrides the (doc_id, shs) hashed-shingle table — the
    fused minhash path passes the one it already computed alongside the
    signatures; by default it is derived here for candidate docs only.
    """
    if arrs is None:
        cand_docs = _candidate_docs(pairs)
        arrs = docs.join(cand_docs, "doc_id", "left_semi").select(
            "doc_id", _hashed_shingle_array_udf(n)(text_col).alias("shs")
        )
        if checkpoint_shingles:
            arrs = arrs.localCheckpoint(eager=False)

    # |A∩B| via the NATIVE array_intersect expression (round-6): the
    # previous per-pair numpy intersect1d ran at Python's ~17 us/pair
    # floor and serialized behind AQE-coalesced partitions — at sf0.1
    # (73k candidate pairs) the Arrow verify was ~2.0 s vs ~0.65 s for
    # the JVM expression, with 0 count mismatches across every pair.
    # array_intersect is set-semantic (dedups), exactly intersect1d's
    # behavior and DuckDB's list_intersect, so a freak within-doc hash
    # collision still degrades to set semantics on both sides. This
    # also removes the last JVM->Python array shipment from the verify.
    joined = (
        pairs.join(
            arrs.select(
                F.col("doc_id").alias("doc_a"), F.col("shs").alias("sa")
            ),
            "doc_a",
        )
        .join(
            arrs.select(
                F.col("doc_id").alias("doc_b"), F.col("shs").alias("sb")
            ),
            "doc_b",
        )
        # compute `shared` once in its own projection: Catalyst does
        # not CSE a repeated expression across output columns
        .select(
            "doc_a", "doc_b", "sa", "sb",
            F.size(F.array_intersect("sa", "sb")).cast("long").alias(
                "shared"
            ),
        )
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("shared")
                / (F.size("sa") + F.size("sb") - F.col("shared"))
            ).alias("jaccard"),
        )
    )
    return joined.filter(F.col("jaccard") >= threshold).select(
        "doc_a", "doc_b", round6(F.col("jaccard")).alias("jaccard")
    )


def minhash_lsh_dedup(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 2,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    threshold: float = 0.5,
    checkpoint_candidates: bool = True,
    verify: str = "arrays",
) -> DataFrame:
    """End-to-end MinHash-LSH near-dup pairs (verified Jaccard).

    Round-5 shape: band keys come straight off the signature ARRAY
    (:func:`minhash_band_table` — no explode->regroup shuffle), and the
    default verify is the "arrays" fast path (see
    :func:`jaccard_verify`; pass ``verify="counts"`` for the
    long-document scale shape — the candidate generation is identical,
    only the verify join geometry changes).

    With ``verify="arrays"`` AND checkpointing on, the whole pipeline
    runs off ONE fused Arrow pass (:func:`_sig_and_shingles_udf`): each
    document is tokenized once and each batch-distinct shingle md5'd
    once, yielding both the signature (bands) and the hashed shingle
    array (verify) — the standalone path pays that work twice.

    The candidate pairs feed the verify step TWICE (as join keys and as
    the doc pruning set), so by default they are lazily
    local-checkpointed: computed once on first action, reused, lineage
    cut (measured ~25% off the whole pipeline at sf0.1). Pass
    ``checkpoint_candidates=False`` on clusters with aggressive dynamic
    executor deallocation, where localCheckpoint blocks can be lost
    with their executor mid-job (this also disables the banded-side and
    shingle-table checkpoints and the fused single-pass, keeping the
    whole plan visible).
    """
    if verify == "arrays" and checkpoint_candidates:
        # fused single-pass: signature + hashed shingles together; the
        # combo table is the one checkpoint both bands and verify read
        combo = docs.select(
            "doc_id",
            _sig_and_shingles_udf(n, num_hashes)(text_col).alias("s"),
        ).localCheckpoint(eager=False)
        banded = _band_keys_from_mh(
            combo.select("doc_id", F.col("s.mh").alias("mh")),
            num_hashes, rows_per_band,
        )
        # banded is a cheap projection over the checkpointed combo —
        # no further checkpoint needed for the self-join sides
        cand = _pairs_from_banded(banded, checkpoint_banded=False)
        cand = cand.localCheckpoint(eager=False)
        # arrs feeds BOTH verify join sides; without its own lazy
        # checkpoint the (combo scan + candidate-distinct + semi-join)
        # subplan executes twice per action (round-6; the arrs=None
        # branch of _jaccard_verify_arrays already checkpoints). The
        # semi-join itself stays: it is what keeps shingle ARRAYS off
        # the shuffle for non-candidate docs at scale.
        arrs = combo.join(
            _candidate_docs(cand), "doc_id", "left_semi"
        ).select(
            "doc_id", F.col("s.shs").alias("shs")
        ).localCheckpoint(eager=False)
        return _jaccard_verify_arrays(
            cand, docs, text_col, n, threshold,
            checkpoint_shingles=False, arrs=arrs,
        )
    banded = minhash_band_table(docs, text_col, n, num_hashes, rows_per_band)
    cand = _pairs_from_banded(banded, checkpoint_banded=checkpoint_candidates)
    if checkpoint_candidates:
        cand = cand.localCheckpoint(eager=False)
    return jaccard_verify(
        cand, docs, text_col, n, threshold,
        method=verify, checkpoint_shingles=checkpoint_candidates,
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(
    docs: DataFrame, text_col: str = "text", bits: int = 16
) -> DataFrame:
    """(doc_id, simhash): per-bit majority vote over token md5 digests.

    Bit b of token t = parity of hex digit b of md5(t) (one digit per
    bit, so bits <= 32). simhash bit b is set iff sum over tokens of
    (+1/-1) is positive. Portable: identical arithmetic in DuckDB.
    """
    if bits > 32:
        raise ValueError("bits must be <= 32 (one hex digit per bit)")
    # ONE narrow Arrow pass per doc: md5 per token (hashlib — identical
    # hexdigests to Spark/DuckDB md5), per-bit ±1 majority. The
    # expression form (explode words -> md5 -> `bits` conditional
    # sums in a hash aggregate) shuffles every token row and evaluates
    # bits x tokens conv/substring expressions; a fold-per-bit HOF
    # variant is worse still (re-hashes every token per bit).
    #
    # Round-6 vectorization (the _minhash_array_udf playbook, guide
    # §4.2): the old body looped words x bits in Python per row. Now
    # one factorize over the batch's flattened tokens, ONE md5 per
    # batch-distinct token, a (distinct x bits) ±1 matrix from the raw
    # hex bytes, and per-doc vote sums via add.reduceat. All-integer
    # arithmetic with the same votes>0 majority, so signatures are
    # bit-identical to the row form (pytest parity) and the DuckDB
    # oracle hash compare is unchanged.
    import hashlib

    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _simhash(texts: pd.Series) -> pd.Series:
        toks = [None if t is None else _py_words(t) for t in texts]
        # None text and zero-token text both yield null, matching the
        # explode form (no vote rows -> doc dropped)
        lens = np.array([len(w) if w else 0 for w in toks], dtype=np.int64)
        flat: list[str] = []
        for w in toks:
            if w:
                flat.extend(w)
        if flat:
            codes, uniques = pd.factorize(
                pd.Series(flat, dtype="object"), use_na_sentinel=False
            )
            hexes = "".join(
                hashlib.md5(u.encode()).hexdigest()[:bits] for u in uniques
            )
            digits = np.frombuffer(hexes.encode(), dtype=np.uint8).reshape(
                len(uniques), bits
            )
            odd_vals = np.frombuffer(b"13579bdf", dtype=np.uint8)
            pm = np.where(np.isin(digits, odd_vals), 1, -1).astype(np.int64)
            seg = lens[lens > 0]
            starts = np.concatenate(([0], np.cumsum(seg)[:-1])).astype(
                np.int64
            )
            votes = np.add.reduceat(pm[codes], starts, axis=0)
            weights = np.int64(1) << np.arange(bits, dtype=np.int64)
            sigs = ((votes > 0) * weights).sum(axis=1)
        out: list[int | None] = []
        j = 0
        for ln in lens:
            if ln == 0:
                out.append(None)
            else:
                out.append(int(sigs[j]))
                j += 1
        return pd.Series(out, dtype="object")

    return docs.select(
        "doc_id", _simhash(text_col).alias("simhash")
    ).filter(F.col("simhash").isNotNull())


def simhash_near_dups(
    docs: DataFrame,
    text_col: str = "text",
    bits: int = 16,
    max_hamming: int = 3,
    checkpoint_banded: bool = True,
) -> DataFrame:
    """(doc_a, doc_b, hamming) pairs within Hamming distance.

    Blocking is EXACT by pigeonhole: the signature is split into
    ``max_hamming + 1`` disjoint bit-bands, so any pair within distance
    ``max_hamming`` has at least one band with zero differing bits and
    meets in that band's bucket. (The earlier 2-half variant only
    guaranteed recall for distance < 2 while defaulting to 3.)
    Candidates meet on an equi-join keyed by (band index, band value) —
    one shuffle on uniform keys — then verify with bit_count(xor).

    The banded table feeds both self-join sides; the lazy
    localCheckpoint (round-4) runs the simhash Arrow pass once instead
    of twice per action — same escape-hatch rationale as
    lsh_candidate_pairs.
    """
    sh = simhash(docs, text_col, bits)
    n_bands = max_hamming + 1
    if n_bands > bits:
        raise ValueError("max_hamming + 1 bands need at least that many bits")
    base, rem = divmod(bits, n_bands)
    widths = [base + (1 if i < rem else 0) for i in range(n_bands)]
    offsets = [sum(widths[:i]) for i in range(n_bands)]
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                (
                    F.shiftright("simhash", offsets[i]) % (2 ** widths[i])
                ).alias("val"),
            )
            for i in range(n_bands)
        ]
    )
    banded = sh.select(
        "doc_id", "simhash", F.explode(bands).alias("bk")
    ).select(
        "doc_id",
        "simhash",
        F.col("bk.band").alias("band"),
        F.col("bk.val").alias("val"),
    )
    if checkpoint_banded:
        banded = banded.localCheckpoint(eager=False)
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "val"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def connected_components(
    pairs: DataFrame,
    max_iter: int = 20,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    strict: bool = True,
) -> DataFrame:
    """(doc_id, cluster_id): connected components over near-dup pairs.

    Min-label propagation WITH pointer jumping: every node starts
    labeled with its own id; each round it adopts the minimum label
    among itself and its neighbors, then shortcuts to its label's label
    (labels are node ids, so the label table doubles as a pointer
    table). Plain propagation needs O(component diameter) rounds —
    near-dup graphs at corpus scale produce exactly the long chains
    that exhaust a fixed budget; the shortcut halves remaining distance
    per round, so convergence is O(log diameter): ``max_iter=20``
    covers diameters beyond 10^6. The canonical dedup-clustering step
    after pair generation: cluster_id = the smallest doc id in the
    component (keep it, drop the rest).

    Convergence is CHECKED (a round that changes nothing ends the
    loop); if ``max_iter`` rounds still changed labels the result would
    be silently wrong, so ``strict=True`` (default) raises instead —
    ``strict=False`` callers get the unconverged labels and must treat
    them as an under-merge.

    Scale shape: each round is two joins + one min-aggregate on
    key-partitioned id tables — the standard large-graph CC under Spark
    without GraphX/graphframes.
    """
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(
            pairs.select(
                F.col(b_col).alias("src"), F.col(a_col).alias("dst")
            )
        )
        .distinct()
        .cache()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .cache()
    )
    converged = False
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.src == labels.node)
            .groupBy("dst")
            .agg(F.min("label").alias("nbr_label"))
        )
        # lineage truncation, not just caching: `propagated` feeds the
        # next plan TWICE (as itself and as the pointer table), so an
        # uncut lineage doubles per round — exponential plan growth and
        # a driver OOM by round ~10. localCheckpoint materializes the
        # rows and makes each round's plan start flat, the standard
        # shape for iterative DataFrame algorithms (cf. MLlib).
        # lazy: materializes inside the new_labels job below (one job
        # instead of a separate eager barrier per round — round-6; the
        # lineage cut is identical once materialized, and `parent` +
        # `propagated` still read the same checkpointed blocks)
        # old_label (the round-start label) rides the checkpointed frame
        # so the convergence check below is a join-free filter over the
        # blocks the round just materialized — one narrow column instead
        # of a per-round join of the old and new label tables (round-6).
        propagated = (
            labels.join(
                neighbor_min, labels.node == neighbor_min.dst, "left"
            )
            .select(
                "node",
                F.col("label").alias("old_label"),
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=False)
        )
        # pointer jumping: adopt my label's own label (always <= mine,
        # since per-node labels only ever decrease from node id)
        parent = propagated.select(
            F.col("node").alias("label"),
            F.col("label").alias("_grand"),
        )
        new_labels = (
            propagated.join(parent, "label", "left")
            .select(
                "node",
                "old_label",
                F.least(
                    F.col("label"), F.coalesce("_grand", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.filter(F.col("label") != F.col("old_label"))
            .limit(1)
            .count()
        )
        # release superseded storage (round-4 ADVICE fix): new_labels is
        # already eagerly materialized, so the intermediate propagated
        # frame and the previous labels (the initial .cache() in round 1,
        # a checkpointed frame afterwards) are dead weight that would
        # otherwise accumulate one block-set per round per call in a
        # long-lived session
        propagated.unpersist()
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if not converged and strict:
        raise RuntimeError(
            f"connected_components: labels still changing after "
            f"max_iter={max_iter} rounds — result would under-merge "
            f"clusters. Raise max_iter (each round doubles reachable "
            f"distance) or pass strict=False to accept partial labels."
        )
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 2,
    threshold: float = 0.5,
    max_doc_freq: int = 100,
    checkpoint_candidates: bool = True,
) -> DataFrame:
    """Near-dup pairs via shared-shingle blocking + exact Jaccard.

    ``max_doc_freq`` drops shingles appearing in more docs — the
    explicit skew guard: a stopword shingle in 10^9 docs would otherwise
    create a quadratic join partition.

    The guard broadcasts the HOT set (df > max_doc_freq) and anti-joins
    it away. Hot shingles are tiny by construction (each needs more than
    max_doc_freq occurrences, so there are at most |corpus shingle
    instances| / max_doc_freq of them); the rare set is ~every distinct
    shingle — billions of rows at 100 TB, never broadcastable.
    """
    sh = shingle_table(docs, text_col, n)
    # the shingle table feeds THREE consumers per action (the hot-set
    # aggregate and both sides of the self-join), so the tokenize+
    # shingle Arrow pass used to run 3x — the repo's twice-referenced-
    # subplan rule (round-6: lazy localCheckpoint runs it once; same
    # escape hatch semantics as the candidate checkpoint below)
    if checkpoint_candidates:
        sh = sh.localCheckpoint(eager=False)
    hot = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > max_doc_freq)
        .select("shingle")
    )
    sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    pairs = (
        sh.alias("a")
        .join(sh.alias("b"), "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    # the candidate pairs feed jaccard_verify twice (join keys + doc
    # pruning set); checkpoint so the shingle self-join runs once.
    # checkpoint_candidates=False keeps the full plan visible (plan-pin
    # tests) or avoids localCheckpoint under dynamic allocation.
    if checkpoint_candidates:
        pairs = pairs.localCheckpoint(eager=False)
    return jaccard_verify(pairs, docs, text_col, n, threshold)


def line_dedup(
    docs: DataFrame,
    text_col: str = "text",
    min_doc_freq: int = 2,
    line_sep: str = "\n",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_lines, n_kept, clean_text): drop every line whose
    exact content appears in at least ``min_doc_freq`` DISTINCT
    documents — RefinedWeb/C4-style line-level exact dedup (the pass
    that strips boilerplate lines like nav menus and cookie banners
    that repeat across a site).

    Scale shape: lines explode once; the document-frequency aggregate
    groups on the md5 DIGEST of the line (32 bytes through the shuffle,
    never the line text), exactly like exact_dedup; hot lines are by
    definition the duplicated ones, and a uniform digest key cannot
    skew. The hot-digest set joins back as a left-anti (no broadcast
    assumption — at corpus scale the duplicated-line set is itself
    large). Rebuild is one groupBy over (doc, kept lines) with an
    in-group array_sort — no window, no global sort. Documents whose
    every line was dropped still emit a row (clean_text = '').

    Null text is coalesced to '' up front so both engines agree by
    construction (Spark's size(split(NULL)) is -1 while SQL splits of
    NULL vanish or nullify — the same latent-mismatch class the
    repetition-stats ADVICE fix closed).

    NOTE: the input is referenced TWICE in the plan (line explode +
    per-doc line totals). A parquet-backed input just scans twice —
    fine. An input that is itself an expensive computed subplan should
    be ``localCheckpoint(eager=False)``-ed by the caller first, or its
    subplan executes twice (the repo twice-referenced-subplan rule;
    halved the line_dedup gate entry at sf0.1).
    """
    docs = docs.withColumn(
        text_col, F.coalesce(F.col(text_col), F.lit(""))
    )
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), line_sep)).alias(
            "line_no", "line"
        ),
    ).withColumn("digest", F.md5("line"))
    hot = (
        lines.groupBy("digest")
        .agg(F.count_distinct(F.col(id_col)).alias("line_df"))
        .filter(F.col("line_df") >= min_doc_freq)
        .select("digest")
    )
    kept = lines.join(hot, "digest", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("line_no", "line"))),
                lambda s: s["line"],
            ),
            line_sep,
        ).alias("clean_text"),
    )
    totals = docs.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), line_sep))
        .cast("long")
        .alias("n_lines"),
    )
    return (
        totals.join(rebuilt, id_col, "left")
        .select(
            id_col,
            "n_lines",
            F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


def keep_best_in_clusters(
    scored_docs: DataFrame,
    pairs: DataFrame,
    score_col: str = "quality",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, cluster_id, <score_col>, keep): near-dup clusters keep
    their HIGHEST-SCORING member instead of the lowest id.

    The production keep policy for near-dup dedup: min-id keeps
    whichever copy happened to be crawled first; keeping the argmax of
    a quality signal (language quality, length, recency score — any
    per-doc column) retains the best representative. Clusters come
    from :func:`connected_components` over ``pairs``; documents in no
    pair are singleton clusters of themselves and always kept. Ties
    break by min id (deterministic).

    Scale shape: CC is the existing O(log diameter) loop; the label
    attach is one id-keyed left join (labels are ids-only); the keep
    decision is one window over cluster_id — clusters are small by
    construction (near-dup groups), so no skew concern.
    """
    from pyspark.sql import Window

    labels = connected_components(pairs, a_col="doc_a", b_col="doc_b")
    joined = scored_docs.select(F.col(id_col), F.col(score_col)).join(
        labels.withColumnRenamed("doc_id", id_col), id_col, "left"
    )
    clustered = joined.withColumn(
        "cluster_id", F.coalesce("cluster_id", F.col(id_col))
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    return clustered.select(
        id_col,
        "cluster_id",
        score_col,
        (F.row_number().over(w) == 1).alias("keep"),
    )
