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
