"""Connected-components clustering over near-dup pairs."""


def test_connected_components(spark):
    from studiocr_spark.operators.dedup import connected_components

    # two components: a chain 1-2-3-4 and a pair 10-11
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "doc_a long, doc_b long"
    )
    got = {
        r.doc_id: r.cluster_id for r in connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}
