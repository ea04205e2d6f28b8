"""Co-located joins via bucketing: pre-shuffling both sides of a
recurring join key into the same bucket layout makes every later join
on that key shuffle-free — the classic 100 TB trade (pay one shuffle
at ingest, never again).  Spark only exploits bucketing through the
catalog (`bucketBy` + `saveAsTable`); plain parquet files carry no
bucket metadata, which is why the engine's `DeltaSparkTable` documents
`zorder` for locality and this path for co-location."""

import pytest


@pytest.fixture
def bucketed_pair(spark, tmp_path):
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    names = []
    for name, df, key in (
        ("b_orders", orders, "o_orderkey"),
        ("b_lineitem", lineitem, "l_orderkey"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (df.write.bucketBy(8, key).sortBy(key)
         .option("path", str(tmp_path / name))
         .mode("overwrite").saveAsTable(name))
        names.append(name)
    yield names
    for name in names:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_is_shuffle_free(spark, bucketed_pair):
    """Join on the bucket key: neither side shuffles (no Exchange in
    the plan) and the bucket-pre-sorted layout also removes the Sort."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(
            spark.table("b_lineitem"),
            spark.table("b_orders").o_orderkey
            == spark.table("b_lineitem").l_orderkey,
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == spark.read.parquet(
            "/root/testdata/sf0.001/lineitem.parquet").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_unbucketed_same_join_shuffles(spark):
    """Control: the identical join on raw parquet pays two Exchanges —
    the cost bucketing amortizes away."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        l = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        joined = o.join(l, o.o_orderkey == l.l_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
