"""Weekly ETL pipeline orchestration -- the reference's abr-etl.go main()
(abr-etl.go:22-41) as one Spark-native flow:

    kill-switch check -> routed ingest -> per-dataset transform ->
    partitioned lake write -> (per-dataset post actions) delta ->
    stable-named CSV export

Transport concerns (SFTP download, S3 sync, CloudWatch) are out of engine
scope -- the data path is complete. The kill switch mirrors the
reference's s3://bucket/disabled object (abr-etl.go:59-78) as a lake-root
marker file.
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from abr_etl_spark.operators import delta, maintenance
from abr_etl_spark.sources import lake, routed_ingest

log = logging.getLogger("abr_etl_spark.pipeline")


class PipelineDisabled(RuntimeError):
    pass


@dataclass
class WeeklyConfig:
    drop_dir: str
    lake_root: str
    datasets: tuple[str, ...] = tuple(routed_ingest.FILE_ROUTES)
    key_col: str = "pid"
    sep: str = "|"
    delta_datasets: tuple[str, ...] = ("Agency_Data",)
    export_dir: str | None = None
    results: dict = field(default_factory=dict)


def check_disabled(lake_root: str) -> None:
    """Kill switch: a 'disabled' marker at the lake root aborts the run
    (reference checkDisabledStatus, abr-etl.go:59)."""
    marker = os.path.join(lake_root, "disabled")
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == "disabled":
                raise PipelineDisabled(f"ETL disabled -- {marker}")


def run_weekly(spark: SparkSession, cfg: WeeklyConfig) -> WeeklyConfig:
    """Execute the weekly flow; per-dataset results land in cfg.results."""
    check_disabled(cfg.lake_root)

    for ds in cfg.datasets:
        try:
            df = routed_ingest.ingest_delimited(
                spark, cfg.drop_dir, ds, sep=cfg.sep
            )
        except Exception as exc:  # analysis error when no files match
            log.info("dataset %s: no files in drop (%s)", ds, exc)
            continue
        df = maintenance.apply_transform(ds, df)
        table_path = os.path.join(cfg.lake_root, "DATA", ds)
        lake.write_partitioned(df, table_path)
        cfg.results[ds] = {"table_path": table_path}

        if ds not in cfg.delta_datasets:
            continue
        table = lake.read_lake(spark, table_path)
        try:
            newest, previous = lake.newest_previous(table)
        except ValueError as exc:
            log.info("dataset %s: %s", ds, exc)
            continue
        new_df, old_df = delta.snapshot_pair(
            table, cfg.key_col, newest=newest, previous=previous
        )
        updated = delta.delta_updated(new_df, old_df, cfg.key_col)
        added = delta.delta_added(new_df, old_df, cfg.key_col)
        cfg.results[ds].update(
            {"newest": newest, "previous": previous}
        )
        if cfg.export_dir:
            for action, frame in (("updated", updated), ("added", added)):
                out_dir = os.path.join(
                    cfg.export_dir,
                    f"DELTA/{action.upper()}/{ds}/importdate={newest}",
                )
                os.makedirs(out_dir, exist_ok=True)
                path = lake.export_stable_csv(
                    frame.drop("importdate"), out_dir, f"{ds}_{action}.csv"
                )
                cfg.results[ds][f"{action}_csv"] = path
    return cfg
