"""Round-trip every supported format, including gzip text (the
reference's wire format) and schema-stable reads."""

import pytest
from pyspark.sql import functions as F

from abr_etl_spark.sources import formats
from abr_etl_spark.sources.lake import load_table
from tests.conftest import SF_SMOKE


@pytest.mark.parametrize("fmt", formats.SUPPORTED)
def test_roundtrip(spark, tmp_path, fmt):
    df = load_table(spark, SF_SMOKE, "nation")
    path = str(tmp_path / f"t_{fmt}")
    formats.write_fmt(df, path, fmt)
    back = formats.read_fmt(spark, path, fmt, schema=df.schema)
    assert back.count() == df.count()
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in df.collect()}


def test_gzip_csv_like_reference(spark, tmp_path):
    df = load_table(spark, SF_SMOKE, "region")
    path = str(tmp_path / "gz")
    formats.write_fmt(df, path, "csv", compression="gzip")
    import glob

    assert glob.glob(f"{path}/*.csv.gz")
    back = formats.read_fmt(spark, path, "csv", schema=df.schema)
    assert back.count() == df.count()


def test_unsupported_format_raises(spark, tmp_path):
    df = load_table(spark, SF_SMOKE, "region")
    with pytest.raises(ValueError, match="unsupported"):
        formats.write_fmt(df, str(tmp_path / "x"), "avro")


def test_schema_evolution_mergeschema(spark, tmp_path):
    """A lake partition written BEFORE a column existed must read back
    null-filled under mergeSchema -- the schema-evolution contract every
    long-lived lake needs."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, name string"
    ).write.parquet(f"{path}/batch=1")
    spark.createDataFrame(
        [(3, "c", 9.5)], "id long, name string, score double"
    ).write.parquet(f"{path}/batch=2")
    back = spark.read.option("mergeSchema", True).parquet(path)
    assert set(back.columns) == {"id", "name", "score", "batch"}
    assert back.count() == 3
    assert back.where(F.col("score").isNull()).count() == 2
    assert back.where((F.col("id") == 3) & (F.col("score") == 9.5)).count() == 1
