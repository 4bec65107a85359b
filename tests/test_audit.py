"""The plan auditor reports sane numbers and flags Python-eval plans."""

from abr_etl_spark import audit
from abr_etl_spark.plans import analytics
from tests.conftest import SF_ORACLE


def test_audit_q1(spark):
    info = audit.audit_plan(spark, analytics.q1_pricing_summary(spark, SF_ORACLE))
    assert info["scans"] == 1
    assert info["pushed_filters"] >= 1
    assert info["python_eval"] == 0
    assert info["codegen_subtrees"] >= 1


def test_audit_flags_python(spark):
    from abr_etl_spark.operators import multimodal
    from abr_etl_spark.sources.lake import load_table

    d = load_table(spark, SF_ORACLE, "documents")
    feats = multimodal.extract_features(multimodal.attach_payload(d))
    info = audit.audit_plan(spark, feats)
    assert info["python_eval"] >= 1
