"""Compaction and the per-dataset transform registry."""

from pyspark.sql import functions as F

from abr_etl_spark.operators import maintenance


def test_compaction_reduces_file_count(spark, tmp_path):
    path = str(tmp_path / "frag")
    df = spark.range(10000).select(
        F.col("id"), (F.col("id") % 7).alias("v")
    )
    df.repartition(40).write.parquet(path)  # simulate 40 small files
    import glob

    before = len(glob.glob(f"{path}/part-*"))
    assert before >= 40
    n_out = maintenance.compact_partition(spark, path)
    after = len(glob.glob(f"{path}/part-*"))
    assert after <= n_out < before
    back = spark.read.parquet(path)
    assert back.count() == 10000
    assert back.agg(F.sum("v")).first()[0] == df.agg(F.sum("v")).first()[0]


def test_transform_registry_applies_location_rules(spark):
    df = spark.createDataFrame(
        [("p1", " vic ", "30-00"), ("p2", "nsw", "800")],
        "pid string, state string, postcode string",
    )
    out = {
        r["pid"]: (r["state"], r["postcode"])
        for r in maintenance.apply_transform("Businesslocation", df).collect()
    }
    assert out == {"p1": ("VIC", "3000"), "p2": ("NSW", "0800")}


def test_transform_registry_passthrough_unknown_dataset(spark):
    df = spark.createDataFrame([("x",)], "pid string")
    assert maintenance.apply_transform("Funds", df) is df
