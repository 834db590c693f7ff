"""Scale utilities: salted aggregation equals the plain aggregate."""


def test_salted_sum_matches_plain(spark, make_events):
    from pyspark.sql import functions as F

    from mirabelle_spark import scale

    # heavy skew: one hot key with 500 rows, one cold key with 3
    rows = [{"time": i, "metric": 1.5, "host": "hot"} for i in range(500)]
    rows += [{"time": i, "metric": 2.0, "host": "cold"} for i in range(3)]
    df = make_events(rows)
    salted = scale.salted_sum(df, ["host"], F.col("metric"), salt_buckets=8)
    got = {r.host: r.metric for r in salted.collect()}
    assert got == {"hot": 750.0, "cold": 6.0}


def test_colocate_repartitions_both_sides(make_events):
    from mirabelle_spark import scale

    a = make_events([{"time": 1, "host": "x", "metric": 1}])
    b = make_events([{"time": 1, "host": "x", "metric": 2}])
    ra, rb = scale.colocate(a, b, ["host"], partitions=4)
    assert ra.rdd.getNumPartitions() == 4 == rb.rdd.getNumPartitions()
    joined = ra.join(rb.select("host"), "host")
    assert joined.count() == 1


def test_partition_count_for():
    from mirabelle_spark import scale

    assert scale.partition_count_for(100 * 1024**3, target_mb=256) == 400
    assert scale.partition_count_for(1024) == 64  # clamped floor


def test_bucket_pairs_exhaustive_and_degenerate(spark):
    """_bucket_pairs must emit exactly the i<j pairs of each bucket
    (index-based element_at emission — no slice copies), including a
    degenerate hot bucket, and dedup pairs found in several buckets."""
    from mirabelle_spark.pipeline.dedup import _bucket_pairs

    rows = [
        (list(range(50)),),          # hot bucket: C(50,2) pairs
        ([1, 2],),                   # overlaps pairs with the hot bucket
        ([100, 101, 102],),
    ]
    df = spark.createDataFrame(rows, "ids array<bigint>")
    got = {(r.id_a, r.id_b) for r in _bucket_pairs(df, "ids").collect()}
    want = {(i, j) for i in range(50) for j in range(i + 1, 50)}
    want |= {(100, 101), (100, 102), (101, 102)}
    assert got == want
    assert len(got) == 50 * 49 // 2 + 3


def test_write_bucketed_join_is_shuffle_free(spark):
    """The bucketed-table claim, demonstrated: two tables bucketed on
    the join key produce a SortMergeJoin whose join-key exchange was
    paid at WRITE time — the query plan has no hashpartitioning
    exchange on the key."""
    from pyspark.sql import functions as F

    from mirabelle_spark import scale

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("va")
        )
        b = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
        )
        scale.write_bucketed(a, "bk_a", ["k"], buckets=8)
        scale.write_bucketed(b, "bk_b", ["k"], buckets=8)
        joined = spark.table("bk_a").join(spark.table("bk_b"), "k")
        assert joined.count() == 1000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning(k" not in plan, plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bk_a")
        spark.sql("DROP TABLE IF EXISTS bk_b")
