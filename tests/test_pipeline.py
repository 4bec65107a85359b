"""Full weekly pipeline through the facade: the abr-etl.go main() flow
end-to-end, including the kill switch and the reference's DELTA export
layout (Readme.md: DELTA/{UPDATED,ADDED}/<ds>/importdate=<date>/...)."""

import os

import pytest

from abr_etl_spark import pipeline


def _write_drop(drop):
    drop.mkdir(parents=True)
    week1 = ["pid|abn"] + [f"p{i}|{i}" for i in range(20)]
    week2 = ["pid|abn"] + [f"p{i}|{i if i >= 5 else 999}" for i in range(18)] + [
        "q1|1001"
    ]
    (drop / "VIC190422_ABR_Agency_Data.txt").write_text("\n".join(week1) + "\n")
    (drop / "VIC190429_ABR_Agency_Data.txt").write_text("\n".join(week2) + "\n")
    (drop / "VIC190429_ABR_Funds.txt").write_text("pid|x\nf1|1\n")


def test_run_weekly_end_to_end(spark, tmp_path):
    drop = tmp_path / "drop"
    _write_drop(drop)
    cfg = pipeline.WeeklyConfig(
        drop_dir=str(drop),
        lake_root=str(tmp_path / "lake"),
        datasets=("Agency_Data", "Funds"),
        export_dir=str(tmp_path / "exports"),
    )
    out = pipeline.run_weekly(spark, cfg)
    assert set(out.results) == {"Agency_Data", "Funds"}
    ag = out.results["Agency_Data"]
    assert (ag["newest"], ag["previous"]) == ("2019-04-29", "2019-04-22")
    # reference layout: DELTA/UPDATED/<ds>/importdate=<newest>/<ds>_updated.csv
    assert ag["updated_csv"].endswith(
        "DELTA/UPDATED/Agency_Data/importdate=2019-04-29/Agency_Data_updated.csv"
    )
    updated = open(ag["updated_csv"]).read().strip().splitlines()
    added = open(ag["added_csv"]).read().strip().splitlines()
    assert len(updated) - 1 == 5  # p0..p4 changed abn
    assert len(added) - 1 == 1  # q1


def test_kill_switch_blocks_run(spark, tmp_path):
    root = tmp_path / "lake"
    root.mkdir()
    (root / "disabled").write_text("disabled")
    cfg = pipeline.WeeklyConfig(drop_dir=str(tmp_path), lake_root=str(root))
    with pytest.raises(pipeline.PipelineDisabled):
        pipeline.run_weekly(spark, cfg)
