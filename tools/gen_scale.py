#!/usr/bin/env python3
"""Derive a larger scale factor from driver-provided testdata.

    python tools/gen_scale.py SRC_DIR DST_DIR FACTOR
    python tools/gen_scale.py /root/testdata/sf0.1 .scale/sf1 10

The driver ships sf{0.001,0.01,0.1}; the r11 verdict asks for a
measured decade above that (certify the heavy families at sf1), so
this tool derives sfN = FACTOR isomorphic copies of the source tables,
deterministically (no RNG -- same inputs, same bytes out). The
correctness gate then runs Spark AND the DuckDB oracle on the SAME
derived parquet, so the certification is engine-vs-engine exactly as
at the shipped SFs.

Copy construction (copy 0 is the identity, so the source SF is an
exact subset):

- every key column shifts by ``copy * 10_000_000`` (well above any
  source key), preserving referential integrity within a copy and
  disjointness across copies: customer/orders/lineitem joins, event
  user/session structure, doc and vec ids;
- ``customer.c_name`` is remapped per copy for c > 0: the digit field
  becomes ``(shifted_key * 179424673) mod 100000000003`` (prime
  modulus > the max shifted key at factor 1000, so the map is
  injective), zero-padded to 12 digits. A plain key shift would leave
  the LOW digits unchanged (the shift is a multiple of 10^7), so
  every last-6-chars suffix block -- the linkage family's blocking
  key -- would hold FACTOR exact-copy twins (quadratic blocked-pair
  growth and distance-tied best-matches); the multiplicative mix
  pushes the copy index into the low digits, keeping names unique
  and block cardinality linear (r14 ADVICE);
- ``documents.text`` is token-remapped per copy (token -> c<k>_token),
  so copies share NO shingles: the dedup pair family's candidate and
  survivor structure replicates exactly FACTOR x (linear), instead of
  every doc gaining FACTOR-1 cross-copy near-twins (quadratic pair
  blow-up that no real corpus growth exhibits); n_chars is recomputed
  to keep the n_chars == length(text) invariant;
- ``embeddings.embedding`` applies a per-copy affine index permutation
  (j -> (a_k * j + k) mod dim, a_k odd => bijective), preserving every
  within-copy inner product exactly (permutation is orthogonal) while
  decorrelating copies, so ANN/k-means/PQ structure replicates
  linearly rather than collapsing onto FACTOR-deep ties;
- region/nation are fixed dimensions and copy through unchanged.

Outputs are single .parquet FILES (DuckDB COPY), matching the layout
tools/check_correctness.py and bench.py expect.
"""

from __future__ import annotations

import os
import sys

import duckdb

STRIDE = 10_000_000

#: key columns to shift per table (copy * STRIDE added to each)
KEY_SHIFTS: dict[str, tuple[str, ...]] = {
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}

FIXED_DIMS = ("region", "nation")


def _copy_select(table: str, cols: list[str], c: int, dim: int) -> str:
    """SELECT list for copy ``c`` of one table."""
    shifts = set(KEY_SHIFTS.get(table, ()))
    out = []
    for col in cols:
        if col in shifts:
            out.append(f"{col} + {c * STRIDE} AS {col}")
        elif table == "customer" and col == "c_name" and c > 0:
            # unique name per copy with copy-mixed LOW digits (see
            # module docstring); 1.8e18 max product < int64, and the
            # 12-digit field never truncates (printf pads, only)
            out.append(
                f"printf('Customer#%012d', "
                f"((c_custkey + {c * STRIDE}) * 179424673) "
                f"% 100000000003) AS c_name"
            )
        elif table == "documents" and col == "text" and c > 0:
            pfx = f"c{c}_"
            out.append(
                f"'{pfx}' || replace(text, ' ', ' {pfx}') AS text"
            )
        elif table == "documents" and col == "n_chars" and c > 0:
            pfx = f"c{c}_"
            out.append(
                f"CAST(length('{pfx}' || replace(text, ' ', ' {pfx}')) "
                f"AS BIGINT) AS n_chars"
            )
        elif table == "embeddings" and col == "embedding" and c > 0:
            a = 2 * c + 3  # odd => j -> (a*j + c) % dim is a bijection
            perm = [((a * j + c) % dim) + 1 for j in range(dim)]  # 1-based
            out.append(f"list_select(embedding, {perm}) AS embedding")
        else:
            out.append(col)
    return ", ".join(out)


def main() -> int:
    src, dst, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    # a FACTOR-branch UNION ALL trips the default 1000 parser depth at
    # factor >= 1000 (the sf100 derivation); raise it -- the tree is
    # wide, not deep, and COPY streams it
    con.execute(f"SET max_expression_depth TO {max(1000, 10 * factor)}")
    # Stream, don't hoard: without these the sf100 lineitem derivation
    # (a 1000-branch union over 6e9 rows) buffered ~100 GB trying to
    # keep insertion order for the COPY. Row order inside the output
    # parquet is immaterial -- the cert gate's value hash sorts rows
    # and every consumer is order-insensitive -- so let branches stream
    # to the writer as they finish, under a hard memory ceiling.
    con.execute("SET preserve_insertion_order = false")
    con.execute(
        f"SET memory_limit = '{os.environ.get('GEN_SCALE_MEM', '24GB')}'"
    )
    tables = (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split()
    for t in tables:
        sp = f"{src}/{t}.parquet"
        dp = f"{dst}/{t}.parquet"
        if os.path.exists(dp):
            print(f"{t}: exists, skipped -> {dp}")
            continue
        cols = [r[0] for r in con.sql(f"DESCRIBE SELECT * FROM read_parquet('{sp}')").fetchall()]
        if t in FIXED_DIMS:
            sql = f"SELECT * FROM read_parquet('{sp}')"
        else:
            dim = 0
            if t == "embeddings":
                dim = con.sql(
                    f"SELECT len(embedding) FROM read_parquet('{sp}') LIMIT 1"
                ).fetchone()[0]
            parts = [
                f"SELECT {_copy_select(t, cols, c, dim)} "
                f"FROM read_parquet('{sp}')"
                for c in range(factor)
            ]
            sql = " UNION ALL ".join(parts)
        con.execute(f"COPY ({sql}) TO '{dp}' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM read_parquet('{dp}')").fetchone()[0]
        print(f"{t}: {n} rows -> {dp}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
