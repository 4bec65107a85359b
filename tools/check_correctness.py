#!/usr/bin/env python3
"""Driver-simulation correctness gate: run every queries() entry on Spark
and its oracle_sql() twin on DuckDB at the given sf, compare rows, schema
(column names), and a dtype-sensitive value hash (columns sorted by name,
rows sorted by all columns) -- the same contract the round driver applies.

    python tools/check_correctness.py [sf_dir] [key ...]

Prints one status line per query and a JSON summary; exit 1 on any fail.
"""

from __future__ import annotations

import hashlib
import json
import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), ignore_index=True)
    return pdf


def _value_hash(pdf: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for col in pdf.columns:
        s = pdf[col]
        h.update(col.encode())
        h.update(str(s.dtype).encode())
        for v in s:
            if v is None or (isinstance(v, float) and np.isnan(v)):
                h.update(b"<null>")
            elif isinstance(v, float):
                h.update(f"{v:.6f}".encode())
            elif isinstance(v, (list, np.ndarray)):
                h.update(str(list(v)).encode())
            else:
                h.update(str(v).encode())
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    sys.path.insert(0, ".")
    import __spark_entry__ as entry
    from abr_etl_spark.session import get_spark

    import os

    # The compare leg collects FULL results; snapshot-sized keys (scd2 at
    # sf10 returns ~26M rows) trip Spark's 1g driver.maxResultSize long
    # before the driver heap is at risk -- a harness limit, not an engine
    # one, so the gate raises it (overridable for small boxes).
    spark = get_spark(
        extra_conf={
            "spark.driver.maxResultSize": os.environ.get(
                "CHECK_MAX_RESULT", "8g"
            )
        }
    )
    qs, oracles = entry.queries(), entry.oracle_sql()
    con = duckdb.connect()
    # long sf1 runs: bound the oracle's memory so a heavy CTE can not
    # OOM the whole gate (results print per key either way)
    mem = os.environ.get("CHECK_DUCKDB_MEM")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
    out_json = os.environ.get(
        "CHECK_OUT_JSON", "/tmp/correctness_local.json"
    )
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    results: dict[str, dict] = {}
    n_fail = 0
    for key, fn in qs.items():
        if only and key not in only:
            continue
        t0 = time.time()
        rec: dict = {}
        try:
            sdf = _normalize(fn(spark, sf_dir).toPandas())
            rec["spark_rows"] = len(sdf)
            if key in oracles:
                odf = _normalize(con.sql(oracles[key]).df())
                rec["oracle_rows"] = len(odf)
                rec["rows_match"] = len(sdf) == len(odf)
                rec["schema_match"] = list(sdf.columns) == list(odf.columns)
                rec["dtypes_spark"] = {c: str(sdf[c].dtype) for c in sdf.columns}
                rec["dtypes_oracle"] = {c: str(odf[c].dtype) for c in odf.columns}
                rec["hash_match"] = _value_hash(sdf) == _value_hash(odf)
            else:
                rec["rows_match"] = rec["schema_match"] = True
                rec["hash_match"] = rec["spark_rows"] >= 0
            rec["err"] = None
        except Exception as e:  # noqa: BLE001
            rec["err"] = f"{type(e).__name__}: {e}"[:300]
            rec["rows_match"] = rec["schema_match"] = rec["hash_match"] = False
        rec["sec"] = round(time.time() - t0, 2)
        # free the pair-operators' materialized result caches between keys
        # so a full 130-key run stays memory-bounded (functions/cache.py
        # owns them; repeats inside one key still reuse via CacheManager).
        from abr_etl_spark.functions.cache import release_result_caches

        release_result_caches()
        ok = rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
        n_fail += 0 if ok else 1
        status = "ok  " if ok else "FAIL"
        extra = ""
        if not ok and rec["err"] is None:
            ds = {
                c: (rec["dtypes_spark"].get(c), rec["dtypes_oracle"].get(c))
                for c in set(rec.get("dtypes_spark", {}))
                | set(rec.get("dtypes_oracle", {}))
                if rec["dtypes_spark"].get(c) != rec["dtypes_oracle"].get(c)
            }
            extra = f" dtype-diff={ds}" if ds else ""
        print(
            f"{status} {key:32s} rows={rec.get('spark_rows')} "
            f"{rec['sec']}s{extra} {rec['err'] or ''}",
            flush=True,
        )
        results[key] = rec
        # incremental persistence: a killed run keeps its finished keys
        with open(out_json, "w") as f:
            json.dump(results, f, indent=1, default=str)
    total = sum(r["sec"] for r in results.values())
    print(
        json.dumps(
            {
                "checked": len(results),
                "fails": n_fail,
                "total_sec": round(total, 1),
            }
        )
    )
    with open(out_json, "w") as f:
        json.dump(results, f, indent=1, default=str)
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
