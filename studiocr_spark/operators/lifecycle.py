"""Document lifecycle DML: D1-D4, J6 unique naming, W2 renumbering.

Reference behaviors rebuilt (cites into /root/reference/StudiOCR/):
- D1 cascading delete doc -> pages -> blocks + vacuum (db.py:26-38)
- D2 rename with uniqueness check (DocWindow.py:136-155)
- D3 append pages to an existing doc with page-number offset
  (OcrEngine.py:107-110,127-128)
- D4 dedup of the input manifest (EditDocWindow.py:463-479)
- J6 name-collision suffix loop (OcrEngine.py:112-118)
- W1/W2 sort-by-submission-index + dense renumber (OcrEngine.py:124-128)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..sources.catalog import ParquetCatalog

DOC_TABLES = ("ocr_blocks", "ocr_pages", "documents")


def delete_document(catalog: ParquetCatalog, url: str, vacuum: bool = True) -> dict[str, int]:
    """D1: cascade-delete one document across all three tables.

    Returns rows deleted per table (A9: the reference reports the count,
    db.py:26-38). Parquet path = filter-rewrite new snapshot; Iceberg
    path is a metadata DELETE. ``vacuum`` mirrors db.py:37.
    """
    deleted = {}
    for table in DOC_TABLES:
        if catalog.exists(table):
            deleted[table] = catalog.delete_where(table, F.col("url") == F.lit(url))
            if vacuum:
                catalog.vacuum(table)
    return deleted


def resolve_unique_names(
    candidates: DataFrame, existing: DataFrame | None
) -> DataFrame:
    """J6: assign collision-free names by numeric suffix.

    ``candidates``: (url, name, submit_idx) — submit_idx is the queue
    order (ties in a batch resolved by it, matching the serial reference
    loop). ``existing``: (name) already committed.

    Exact reference semantics (OcrEngine.py:112-118): try ``name``, then
    ``name1``, ``name2``, ... skipping taken values; earlier submissions
    claim earlier suffixes. All-native: per base name, collect the taken
    suffix set, then each candidate picks the rn-th free slot from the
    ordered domain [bare, 1, 2, ...].
    """
    spark = candidates.sparkSession
    if existing is None:
        existing = spark.createDataFrame([], "name string")

    # decompose existing names into (base, suffix): 'doc' -> ('doc', 0),
    # 'doc3' -> ('doc3', 0) AND potentially suffix 3 of base 'doc'. A name
    # like 'doc3' blocks candidate base 'doc3' (bare) and candidate base
    # 'doc' at suffix 3 — model both.
    bases = candidates.select("name").distinct()
    ex = existing.select(F.col("name").alias("ex_name"))
    taken = (
        bases.join(
            ex,
            (F.col("ex_name") == F.col("name"))
            | (
                F.col("ex_name").startswith(F.col("name"))
                # only suffixes the reference loop can generate block a
                # slot: str(n) for n >= 1, so no leading zeros and no '0'
                & F.expr("substring(ex_name, length(name) + 1) rlike '^[1-9][0-9]*$'")
            ),
            "left",
        )
        .select(
            "name",
            F.when(F.col("ex_name") == F.col("name"), F.lit(0))
            .otherwise(
                F.expr("cast(substring(ex_name, length(name) + 1) as int)")
            )
            .alias("suffix"),
        )
        .groupBy("name")
        .agg(F.array_sort(F.collect_set("suffix")).alias("taken"))
    )

    w = Window.partitionBy("name").orderBy("submit_idx")
    with_rn = candidates.withColumn("rn", F.row_number().over(w))
    joined = with_rn.join(taken, "name", "left").withColumn(
        "taken", F.coalesce(F.col("taken"), F.array())
    )
    # free suffix domain 0..(len(taken)+rn): always enough slots
    free = F.array_except(
        F.sequence(F.lit(0), F.size("taken") + F.col("rn")), F.col("taken")
    )
    resolved = joined.withColumn(
        "final_name",
        F.when(
            F.element_at(free, F.col("rn")) == 0, F.col("name")
        ).otherwise(
            F.concat(F.col("name"), F.element_at(free, F.col("rn")).cast("string"))
        ),
    )
    return resolved.select(
        "url", F.col("name").alias("requested_name"),
        F.col("final_name").alias("name"), "submit_idx",
    )


def renumber_pages(
    new_pages: DataFrame, existing_pages: DataFrame | None
) -> DataFrame:
    """W1+W2: order new pages by submission index, renumber densely with
    the per-doc offset = existing page count (OcrEngine.py:124-128).

    ``new_pages`` must carry (url, page_idx); output replaces page_no.
    """
    if existing_pages is not None:
        offsets = existing_pages.groupBy("url").agg(
            F.count("*").cast("int").alias("offset")
        )
    else:
        offsets = None
    w = Window.partitionBy("url").orderBy("page_idx")
    out = new_pages.withColumn("rn", F.row_number().over(w))
    if offsets is not None:
        out = out.join(F.broadcast(offsets), "url", "left").withColumn(
            "offset", F.coalesce(F.col("offset"), F.lit(0))
        )
    else:
        out = out.withColumn("offset", F.lit(0))
    return out.withColumn(
        "page_no", (F.col("rn") - 1 + F.col("offset")).cast("int")
    ).drop("rn", "offset", "page_idx")


def rename_document(
    catalog: ParquetCatalog, url: str, new_name: str
) -> bool:
    """D2: rename with the F5 existence check (DocWindow.py:136-155).

    Returns False (no-op) when the name is taken by another doc.
    """
    docs = catalog.read("documents")
    clash = docs.filter(
        (F.col("name") == F.lit(new_name)) & (F.col("url") != F.lit(url))
    ).limit(1).count()
    if clash:
        return False
    catalog.overwrite(
        docs.withColumn(
            "name",
            F.when(F.col("url") == F.lit(url), F.lit(new_name)).otherwise(
                F.col("name")
            ),
        ),
        "documents",
    )
    return True


def dedup_manifest(pages: DataFrame) -> DataFrame:
    """D4: drop duplicate input urls (EditDocWindow.py:463-479).

    dropDuplicates = hash agg on url; AQE handles the shuffle sizing.
    """
    return pages.dropDuplicates(["url"])
