#!/usr/bin/env python3
"""Bounded-digest correctness check for keys whose OUTPUT is data-sized
(r15 verdict item 2: delta_apply_roundtrip returns the full ~0.9x-corpus
snapshot -- ~540M rows at sf100 -- so the standard gate's full-collect
compare is infeasible there; the digest compares the two engines WITHOUT
moving the result to the driver).

    python tools/digest_check.py SF_DIR KEY [KEY ...]

Digest = one aggregation over the key's result, built from its schema
with engine-portable expressions (identical SQL text runs on the Spark
result via a temp view and on the DuckDB oracle as a subquery):
  numeric  -> SUM(mod-bounded int), SUM of e2-quantized mod-bounded for
              doubles, COUNT(col)
  string   -> SUM(length(col)), COUNT(DISTINCT col)
  date/ts  -> COUNT(DISTINCT col), MIN/MAX as ISO strings
plus COUNT(*). Agreement on every digest column + the count is a strong
(not cryptographic) equality check; the CORRECTNESS artifact row records
method = "bounded-digest" so the weaker contract is explicit.

Exit 1 on any mismatch; prints one JSON line per key.
"""

from __future__ import annotations

import json
import sys

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()

MOD = 1000003  # prime; bounds SUMs far below int64 overflow


def _digest_exprs(schema) -> list[str]:
    out = ["CAST(COUNT(*) AS BIGINT) AS d_count"]
    for f in schema.fields:
        c, t = f.name, f.dataType.simpleString()
        if t in ("int", "bigint", "smallint", "tinyint"):
            out.append(f"CAST(SUM({c} % {MOD}) AS BIGINT) AS d_{c}_summod")
            out.append(f"CAST(COUNT({c}) AS BIGINT) AS d_{c}_n")
        elif t in ("double", "float") or t.startswith("decimal"):
            out.append(
                f"CAST(SUM(CAST(floor({c} * 100 + 0.5) AS BIGINT) % {MOD}) "
                f"AS BIGINT) AS d_{c}_summod"
            )
            out.append(f"CAST(COUNT({c}) AS BIGINT) AS d_{c}_n")
        elif t == "string":
            out.append(f"CAST(SUM(length({c})) AS BIGINT) AS d_{c}_len")
            out.append(f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS d_{c}_nd")
        elif t in ("date",) or t.startswith("timestamp"):
            out.append(f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS d_{c}_nd")
            out.append(f"MIN(CAST({c} AS STRING)) AS d_{c}_min")
            out.append(f"MAX(CAST({c} AS STRING)) AS d_{c}_max")
        elif t == "boolean":
            out.append(
                f"CAST(SUM(CASE WHEN {c} THEN 1 ELSE 0 END) AS BIGINT) AS d_{c}_true"
            )
            out.append(f"CAST(COUNT({c}) AS BIGINT) AS d_{c}_n")
        # arrays/maps/structs: skipped (no such key needs the digest path)
    return out


def main() -> int:
    sf_dir, keys = sys.argv[1], sys.argv[2:]
    sys.path.insert(0, ".")
    import __spark_entry__ as entry
    from abr_etl_spark.session import get_spark

    spark = get_spark("digest-check")
    qs, oracles = entry.queries(), entry.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    fails = 0
    for key in keys:
        df = qs[key](spark, sf_dir)
        exprs = _digest_exprs(df.schema)
        sel = ", ".join(exprs)
        df.createOrReplaceTempView("__digest_in")
        srow = spark.sql(f"SELECT {sel} FROM __digest_in").collect()[0]
        sdig = {k: srow[k] for k in srow.asDict()}
        orow = con.sql(
            f"SELECT {sel} FROM ({oracles[key]})"
        ).df().iloc[0]
        odig = {k: orow[k] for k in orow.index}
        diffs = {
            k: (str(sdig[k]), str(odig.get(k)))
            for k in sdig
            if str(sdig[k]) != str(odig.get(k))
        }
        ok = not diffs
        fails += 0 if ok else 1
        print(
            json.dumps(
                {
                    "key": key,
                    "ok": ok,
                    "rows": int(sdig["d_count"]),
                    "digest_cols": len(sdig),
                    "diffs": diffs,
                }
            ),
            flush=True,
        )
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
