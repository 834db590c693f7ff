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


def test_needs_rebalance_sees_through_empty_splits(spark, tmp_path):
    """The r13 two-armed rebalance probe: a small-split scan profile
    over a one-row-group parquet yields many split DESCRIPTORS with
    all rows in ONE of them — the r12 count-only probe read that as
    'well-partitioned' and one core ran the whole downstream explode
    (112 s vs 11 s on the sf1 char-grain ExactSubstr). Arm 1
    (plan-stats bytes < 4 GiB) must fire regardless of the split
    count, and ensure_parallelism must actually spread the rows."""
    from pyspark.sql import functions as F

    from mirabelle_spark import scale

    p = str(tmp_path / "onegroup")
    spark.range(20000).selectExpr(
        "id", "repeat('x', 64) AS pad"
    ).coalesce(1).write.parquet(p)

    old_max = spark.conf.get("spark.sql.files.maxPartitionBytes")
    old_open = spark.conf.get("spark.sql.files.openCostInBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "16384")
        spark.conf.set("spark.sql.files.openCostInBytes", "1024")
        df = spark.read.parquet(p)
        n_splits = df.rdd.getNumPartitions()
        assert n_splits >= 3  # several descriptors...
        dist = df.groupBy(F.spark_partition_id().alias("pp")).count().collect()
        # ...but parquet can't split below the row group: ONE real
        assert len(dist) == 1 and dist[0]["count"] == 20000
        # the count-only probe (splits < target) says False at
        # target == n_splits; arm 1 must say True anyway
        assert scale.needs_rebalance(df, n_splits)
        out = scale.ensure_parallelism(df, n_splits)
        dist2 = out.groupBy(F.spark_partition_id().alias("pp")).count().collect()
        assert len(dist2) >= 3  # rows actually spread
        assert sum(r["count"] for r in dist2) == 20000
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old_max)
        spark.conf.set("spark.sql.files.openCostInBytes", old_open)


def test_needs_rebalance_trusts_post_shuffle_plans(spark, tmp_path):
    """Arm 0 (r14, ADVICE r13): a DataFrame whose plan already
    contains an exchange-planning node (repartition / aggregate)
    must NOT pay arm 1's unconditional insurance exchange — its
    physical partition count is shuffle-determined and
    authoritative — while a bare scan of the same tiny file still
    triggers arm 1 regardless of its (lying) descriptor count."""
    from pyspark.sql import functions as F

    from mirabelle_spark import scale

    p = str(tmp_path / "tiny")
    spark.range(1000).selectExpr("id", "id % 7 AS k").coalesce(1).write.parquet(p)
    scan = spark.read.parquet(p)
    # bare tiny scan: arm 1 fires (stats < 4 GiB), count irrelevant
    assert scale.needs_rebalance(scan, 1)

    shuffled = scan.repartition(8)
    # post-repartition: count (8) >= target → no rebalance...
    assert not scale.needs_rebalance(shuffled, 8)
    assert scale.ensure_parallelism(shuffled, 8) is shuffled
    # ...but a genuinely under-partitioned post-shuffle plan still
    # rebalances via the count probe
    assert scale.needs_rebalance(scan.repartition(2), 8)

    agged = scan.groupBy("k").agg(F.count("*").alias("c"))
    n = agged.rdd.getNumPartitions()
    assert not scale.needs_rebalance(agged, n)

    # coalesce prints the same 'Repartition' node name with
    # shuffle=false but does NOT redistribute rows — it must fall
    # through to arm 1 (r14 review)
    assert scale.needs_rebalance(scan.coalesce(4), 1)
    # an exchange node on a broadcast join's BUILD side must not
    # vouch for the stream side's scan descriptors: any Join in the
    # plan falls through to arms 1/2 (r14 review)
    small = spark.range(5).selectExpr("id % 7 AS k").distinct()
    joined = scan.join(F.broadcast(small), "k")
    assert scale.needs_rebalance(joined, 1)
    plan = joined._jdf.queryExecution().optimizedPlan().toString()
    assert not scale._plan_has_exchange(plan)
    # same conservatism for Union (ADVICE r14): an Aggregate in ONE
    # unioned branch must not vouch for the other branch's raw
    # one-row-group scan — a linear plan-string walk can't prove the
    # exchange dominates every leaf, so any Union falls through
    agged_branch = scan.groupBy("k").agg(
        F.count("*").cast("long").alias("id2")
    ).selectExpr("k", "id2 AS id")
    unioned = scan.select("k", "id").union(agged_branch)
    assert scale.needs_rebalance(unioned, 1)
    uplan = unioned._jdf.queryExecution().optimizedPlan().toString()
    assert "Union" in uplan and "Aggregate" in uplan
    assert not scale._plan_has_exchange(uplan)


def test_plan_has_exchange_never_matches_expression_text(spark):
    """Node-name matching is anchored at line heads: a column named
    after an exchange node ('Sort', 'Aggregate') inside expression
    text must not flip arm 0."""
    from mirabelle_spark import scale

    df = spark.range(10).selectExpr(
        "id AS Sort", "id AS Aggregate", "id AS Repartition"
    )
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Sort" in plan  # the decoy columns really are in the text
    assert not scale._plan_has_exchange(plan)
    assert scale._plan_has_exchange(
        df.repartition(4)._jdf.queryExecution().optimizedPlan().toString()
    )


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


def test_ivf_trained_quantizer_sf1_recall(spark):
    """r7 (VERDICT r6 ask #6): the KMeans-TRAINED IVF path end-to-end
    at sf1 (20k vectors, 10x the bench corpus). Trained centroids
    must keep recall@10 at or above the fixed-centroid floor the
    driver gate pins (0.6 at nprobe=3/nlist=8) — and at least match
    the generic inlined centroids on the corpus they were fit to.
    Wall-times for PERF ride the same run (printed with -s)."""
    import time

    from pyspark.sql import functions as F

    from mirabelle_spark.pipeline import ann
    from mirabelle_spark.pipeline.ivf_centroids import IVF_CENTROIDS
    from tools.make_sf1 import ensure_sf1

    sf1 = ensure_sf1(spark)
    emb = spark.read.parquet(f"{sf1}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def topset(rows):
        out = {}
        for r in rows:
            out.setdefault(r.query_id, set()).add(r.vec_id)
        return out

    t0 = time.monotonic()
    exact = topset(ann.brute_force_topk(emb, queries, k=10).collect())
    t_exact = time.monotonic() - t0

    t0 = time.monotonic()
    trained = topset(
        ann.ivf_topk(emb, queries, k=10, nlist=8, nprobe=3, seed=42).collect()
    )
    t_trained = time.monotonic() - t0

    fixed = topset(
        ann.ivf_topk(
            emb, queries, k=10, nprobe=3, centroids=IVF_CENTROIDS
        ).collect()
    )

    def recall(approx):
        return sum(len(approx.get(q, set()) & exact[q]) for q in exact) / (
            10.0 * len(exact)
        )

    r_trained, r_fixed = recall(trained), recall(fixed)
    print(
        f"\nsf1 IVF: brute {t_exact:.2f}s; trained fit+probe {t_trained:.2f}s; "
        f"recall@10 trained={r_trained:.3f} fixed={r_fixed:.3f}"
    )
    assert r_trained >= 0.6, f"trained recall {r_trained:.3f} under the gate floor"
    assert r_trained >= r_fixed - 1e-9, (
        f"KMeans fit on the corpus ({r_trained:.3f}) must not lose to the "
        f"generic inlined centroids ({r_fixed:.3f})"
    )
