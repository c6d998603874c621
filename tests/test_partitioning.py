"""E11/E12: skew detection, salted two-phase aggregation, range partitioning."""

from pyspark.sql import functions as F

from trafaret_spark import datagen, partitioning


def test_detect_skew_finds_hot_conversations(spark):
    tr = datagen.transcripts(spark, n_convs=50, hot_convs=2, hot_turns=5000,
                             max_turns=40)
    hot = partitioning.detect_skew(tr, key="conv_id", threshold_rows=1000,
                                   sample=0.2)
    assert set(hot) == {"conv-000000", "conv-000001"}


def test_salted_agg_equals_plain_agg(spark):
    tr = datagen.transcripts(spark, n_convs=30, hot_convs=1, hot_turns=2000,
                             max_turns=30)
    df = tr.withColumn("x", F.length("text").cast("double"))
    got = partitioning.salted_agg(
        df, "conv_id",
        {"n": ("count", "x"), "s": ("sum", "x"), "mn": ("min", "x"),
         "mx": ("max", "x"), "m": ("avg", "x")},
        buckets=8).toPandas().set_index("conv_id").sort_index()
    exp = (df.groupBy("conv_id")
           .agg(F.count("x").alias("n"), F.sum("x").alias("s"),
                F.min("x").alias("mn"), F.max("x").alias("mx"),
                F.avg("x").alias("m"))
           .toPandas().set_index("conv_id").sort_index())
    assert (got["n"] == exp["n"]).all()
    assert abs(got["s"] - exp["s"]).max() < 1e-6
    assert (got["mn"] == exp["mn"]).all() and (got["mx"] == exp["mx"]).all()
    assert abs(got["m"] - exp["m"]).max() < 1e-9


def test_salted_agg_spreads_hot_key(spark):
    tr = datagen.transcripts(spark, n_convs=5, hot_convs=1, hot_turns=3000,
                             max_turns=10)
    salted = partitioning.with_salt(tr, "conv_id", buckets=8)
    spread = (salted.filter(F.col("conv_id") == "conv-000000")
              .select("__salt").distinct().count())
    assert spread >= 6  # the hot key really lands on most of the 8 buckets


def test_repartition_by_conv_colocates_conversations(spark):
    tr = datagen.transcripts(spark, n_convs=20, hot_convs=0, max_turns=20)
    # order=None → range-partition on conv_id alone: equal keys land in one
    # partition (window co-location). With order included, a conversation MAY
    # straddle a range boundary — that variant is for stable output ordering,
    # not co-location.
    out = partitioning.repartition_by_conv(tr, order=None, n=4)
    per = (out.withColumn("pid", F.spark_partition_id())
           .groupBy("conv_id").agg(F.countDistinct("pid").alias("np")))
    assert per.filter(F.col("np") > 1).count() == 0


def test_repartition_with_order_gives_global_order(spark):
    tr = datagen.transcripts(spark, n_convs=10, hot_convs=0, max_turns=15)
    out = partitioning.repartition_by_conv(tr, n=4) \
        .sortWithinPartitions("conv_id", "turn_idx")
    rows = [(r["conv_id"], r["turn_idx"]) for r in out.toLocalIterator()]
    assert rows == sorted(rows)  # partition-concatenation IS the total order
