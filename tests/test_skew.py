"""salted_join must return exactly what the plain join returns."""

from pyspark.sql import functions as F

from simtradedata_spark.operators.skew import salted_join


def test_salted_join_matches_plain(spark):
    # skewed big side: 90% of rows share one key
    big = spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit("hot")).otherwise(
            F.concat(F.lit("k"), F.col("id"))
        ).alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.createDataFrame(
        [("hot", 1.0), ("k950", 2.0), ("missing", 3.0)], "k string, w double"
    )
    plain = big.join(small, ["k"]).orderBy("v").collect()
    salted = salted_join(big, small, ["k"], n_salts=4).orderBy("v").collect()
    assert salted == plain
    assert len(salted) == 901  # 900 hot + k950


def test_salted_left_join_matches_plain(spark):
    big = spark.range(100).select(
        (F.col("id") % 3).cast("string").alias("k"), F.col("id").alias("v")
    )
    small = spark.createDataFrame([("0", 10.0), ("1", 11.0)], "k string, w double")
    plain = sorted(big.join(small, ["k"], "left").collect())
    salted = sorted(salted_join(big, small, ["k"], n_salts=5, how="left").collect())
    assert salted == plain
