"""Property test: the order-pinned double reduction (_SORTED_FOLD on
Spark == _dk_fold on DuckDB == a Python left fold over the j-sorted
pairs) is BIT-IDENTICAL across engines for arbitrary inputs -- the
foundation of every deterministic float aggregation in the catalog
(PCA matvecs/norms/Rayleigh, whitening dots, time-weighted averages).

The strategy mixes magnitudes across 12 orders (where naive float
summation orders visibly diverge), duplicate j keys (sort ties broken
by the t field inside the struct -- both engines sort the full struct),
and negatives.
"""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from abr_etl_spark.plans.llm_pipeline5 import _SORTED_FOLD, _dk_fold

finite = st.floats(
    allow_nan=False,
    allow_infinity=False,
    min_value=-1e6,
    max_value=1e6,
)
pairs = st.lists(
    st.tuples(st.integers(min_value=0, max_value=7), finite),
    min_size=1,
    max_size=24,
)


@given(pairs)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_sorted_fold_bit_identical_across_engines(spark, data):
    rows = [(int(j), float(t)) for j, t in data]
    got_spark = (
        spark.createDataFrame(rows, "j int, t double")
        .select(F.struct("j", "t").alias("s"))
        .agg(F.expr(_SORTED_FOLD).alias("v"))
        .collect()[0]
        .v
    )
    con = duckdb.connect()
    # ship exact float64 bits via a registered frame -- a many-digit SQL
    # literal parses as DECIMAL first in DuckDB and its ::DOUBLE cast
    # can land one ulp off the repr-round-tripped Python float
    import pandas as pd

    con.register(
        "x", pd.DataFrame(rows, columns=["j", "t"]).astype(
            {"j": "int64", "t": "float64"}
        )
    )
    got_ddb = con.execute(
        f"SELECT {_dk_fold('struct_pack(j := j, t := t)')} AS v FROM x"
    ).fetchone()[0]
    con.close()
    # python replay: left fold from 0.0 over (j, t)-sorted pairs
    acc = 0.0
    for _, t in sorted(rows):
        acc = acc + t
    assert got_spark == got_ddb == acc, (rows, got_spark, got_ddb, acc)


def test_sorted_fold_catches_order_sensitivity(spark):
    """Sanity that the property is non-trivial: the same values summed
    in a DIFFERENT order genuinely differ in the last ulp here, so the
    equality above proves order pinning, not float luck."""
    vals = [1e12, 3.14159, -1e12, 2.71828, 1e-7]
    fwd = 0.0
    for v in vals:
        fwd += v
    rev = 0.0
    for v in reversed(vals):
        rev += v
    assert fwd != rev
