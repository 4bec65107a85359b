"""Typed ingest of the 8 real ABR datasets + delta on real-schema
Agency_Data (reference parity: load.go:45-64 routing,
agency-delta.go:127-160 columns)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from abr_etl_spark.operators import delta
from abr_etl_spark.sources import abr_schemas as ab


def _agency_row(pid: int, *, org: str = "ACME PTY LTD", email="a@x.au") -> str:
    vals = {c: "" for c in ab.AGENCY_DATA_COLUMNS}
    vals.update(
        pid=str(pid),
        abn=f"{51824753556 + pid:011d}",
        ent_typ_cd="PRV",
        org_nm=org,
        abn_regn_dt="20000301",
        mn_trdg_nm=f"TRADER {pid}",
        son_sbrb="MELBOURNE",
        son_stt="VIC",
        son_pc="3000",
        son_cntry_cd="AU",
        mn_bus_sbrb="CARLTON",
        mn_bus_stt="VIC",
        mn_bus_pc="3053",
        mn_bus_cntry_cd="AU",
        ent_eml=email,
        gst_regn_dt="20000701",
        mn_indy_clsn="4511",
        mn_indy_clsn_descn="Car retailing",
        acn=f"{4085616 + pid:09d}",
        sprsn_ind="N",
    )
    return "|".join(vals[c] for c in ab.AGENCY_DATA_COLUMNS)


def _write_drop(tmp_path, date6: str, dataset: str, rows: list[str]) -> None:
    header = "|".join(ab.DATASET_COLUMNS[dataset])
    (tmp_path / f"VIC{date6}_ABR_{dataset}.txt").write_text(
        "\n".join([header, *rows]) + "\n"
    )


def _fill(dataset: str, pid: int) -> str:
    vals = {c: f"v{pid}" for c in ab.DATASET_COLUMNS[dataset]}
    vals["pid"] = str(pid)
    vals["abn"] = f"{51824753556 + pid:011d}"
    for c in ab.date_columns(dataset):
        vals[c] = "20240115"
    return "|".join(vals[c] for c in ab.DATASET_COLUMNS[dataset])


def test_ingest_all_eight_datasets_by_name(spark, tmp_path):
    """One heterogeneous drop folder; every dataset ingests with ITS OWN
    columns and types (schema never leaks from another dataset's file)."""
    for ds in ab.DATASET_COLUMNS:
        _write_drop(tmp_path, "240102", ds, [_fill(ds, 1), _fill(ds, 2)])
    for ds, cols in ab.DATASET_COLUMNS.items():
        df = ab.ingest_abr(spark, str(tmp_path), ds)
        assert df.columns == [*cols, "importdate"], ds
        rows = df.orderBy("pid").collect()
        assert len(rows) == 2, ds
        assert rows[0].importdate == datetime.date(2024, 1, 2), ds
        for c in ab.date_columns(ds):
            assert rows[0][c] == datetime.date(2024, 1, 15), (ds, c)


def test_agency_data_round_trip_values(spark, tmp_path):
    _write_drop(tmp_path, "240102", "Agency_Data", [_agency_row(7)])
    row = ab.ingest_abr(spark, str(tmp_path), "Agency_Data").collect()[0]
    assert row.pid == "7"
    assert row.abn == "51824753563"
    assert row.acn == "004085623"  # leading zero preserved (string, not int)
    assert row.abn_regn_dt == datetime.date(2000, 3, 1)
    assert row.son_pc == "3000"
    assert row.sprsn_ind == "N"


def test_schema_does_not_leak_from_alphabetically_first_file(spark, tmp_path):
    """Regression for the folder-wide-inference bug: ACNC sorts first, but
    a Businessname ingest must still see Businessname columns."""
    _write_drop(tmp_path, "240102", "ACNC", [_fill("ACNC", 1)])
    _write_drop(tmp_path, "240102", "Businessname", [_fill("Businessname", 1)])
    df = ab.ingest_abr(spark, str(tmp_path), "Businessname")
    assert "bus_nm" in df.columns and "acnc_regn_dt" not in df.columns
    assert df.count() == 1


def test_agency_delta_on_real_schema(spark, tmp_path):
    """Two weekly Agency_Data snapshots -> added/updated/removed, incl. a
    NULL-involved change the reference's `!=` comparisons would miss."""
    old_rows = [_agency_row(1), _agency_row(2), _agency_row(3), _agency_row(4)]
    new_rows = [
        _agency_row(1),  # unchanged
        _agency_row(2, org="NEW NAME PTY LTD"),  # updated (value change)
        _agency_row(4, email=""),  # updated (value -> NULL)
        _agency_row(5),  # added; pid 3 removed
    ]
    _write_drop(tmp_path, "240102", "Agency_Data", old_rows)
    _write_drop(tmp_path, "240109", "Agency_Data", new_rows)
    lake = ab.ingest_abr(spark, str(tmp_path), "Agency_Data")
    old = lake.where(F.col("importdate") == "2024-01-02").drop("importdate")
    new = lake.where(F.col("importdate") == "2024-01-09").drop("importdate")
    classes = {
        r.pid: r.change
        for r in delta.delta_classify(new, old, ab.AGENCY_DELTA_KEY).collect()
    }
    assert classes == {
        "1": "unchanged",
        "2": "updated",
        "4": "updated",  # NULL-safe hash catches the value->NULL change
        "5": "added",
        "3": "removed",
    }
