"""Property test: the cross-engine hashing primitives in
functions/texthash.py produce IDENTICAL values when evaluated by Spark
and by DuckDB -- the foundation every replicated oracle (minhash, LSH
bands, simhash, fingerprints) rests on.

Parity is NOT ASCII-limited: Spark ascii() and DuckDB unicode() both
return the full Unicode codepoint of the first character, so the
alphabet deliberately mixes ASCII with multibyte letters and an emoji.
"""

import string

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from abr_etl_spark.functions import texthash as th

ALPHABET = string.ascii_letters + string.digits + " .,;-" + "éöæ日本語🙂"
texts = st.lists(
    st.text(alphabet=ALPHABET, min_size=0, max_size=60),
    min_size=1,
    max_size=8,
)


@given(texts)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_polyhash_and_signatures_match_duckdb(spark, batch):
    sdf = spark.createDataFrame([(t,) for t in batch], "text string")
    got = (
        sdf.select(
            F.expr(th.sp_polyhash("text")).alias("ph"),
            F.expr(th.sp_minhash(th.sp_shingle_hashes(th.sp_shingles("text"))))
            .cast("string")
            .alias("mh"),
            F.expr(th.sp_simhash(th.sp_token_hashes(th.sp_tokens("text"))))
            .alias("sh"),
        )
        .toPandas()
        .astype(str)
    )
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"text": batch}))
    want = con.sql(
        f"""
        SELECT {th.dk_polyhash('text')} AS ph,
               CAST({th.dk_minhash(th.dk_shingles('text'))} AS VARCHAR) AS mh,
               {th.dk_simhash(th.dk_token_hashes(th.dk_tokens('text')))} AS sh
        FROM t
        """
    ).df().astype(str)
    con.close()
    # row order is preserved (single partition, no shuffle)
    for col in ("ph", "mh", "sh"):
        assert list(got[col]) == list(want[col]), col


vecs = st.integers(min_value=2, max_value=12).flatmap(
    lambda d: st.tuples(
        st.lists(
            st.floats(
                min_value=-100,
                max_value=100,
                allow_nan=False,
                allow_infinity=False,
                width=32,
            ),
            min_size=d,
            max_size=d,
        ),
        st.lists(
            st.floats(
                min_value=-100,
                max_value=100,
                allow_nan=False,
                allow_infinity=False,
                width=32,
            ),
            min_size=d,
            max_size=d,
        ),
    )
)


@given(vecs)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_cosine_matches_duckdb_bitwise(spark, pair):
    from hypothesis import assume

    a, b = pair
    assume(sum(x * x for x in a) > 0 and sum(x * x for x in b) > 0)
    sdf = spark.createDataFrame(
        [(a, b)], "va array<float>, vb array<float>"
    )
    got = sdf.select(
        F.expr(th.sp_cosine("va", "vb")).alias("cos")
    ).first()["cos"]
    con = duckdb.connect()
    con.register("v", pd.DataFrame({"va": [a], "vb": [b]}))
    want = con.sql(
        f"SELECT {th.dk_cosine('va::FLOAT[]', 'vb::FLOAT[]')} AS cos FROM v"
    ).fetchone()[0]
    con.close()
    # identical operation order => bit-identical doubles, no tolerance
    assert got == want
