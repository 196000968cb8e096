"""Guards for tools/explain_audit's plan-format assumptions.

Through round 6 the audit counted the literal string
``WholeStageCodegen``, which never appears in Spark's *formatted*
explain output — the codegen column silently read 0 for every plan.
These tests pin the real marker (``[codegen id : N]`` on an
AQE-disabled plan) so a future Spark explain-format change fails
loudly instead of blinding the audit again.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_log_analysis_spark.session import scoped_conf  # noqa: E402
from tools.explain_audit import _explain, audit  # noqa: E402


def test_codegen_column_counts_spans(spark, sf_dir):
    """A scan+aggregate query must show >=1 whole-stage span on the
    AQE-off twin, and the AQE static plan must show none (if the AQE
    plan ever starts carrying the markers, the twin-build in main()
    is redundant and this documents the change)."""
    import __spark_entry__ as entrymod

    q = entrymod.queries()["pricing_summary"]
    aqe_plan = _explain(q(spark, sf_dir))
    with scoped_conf(spark, {"spark.sql.adaptive.enabled": "false"}):
        cg_plan = _explain(q(spark, sf_dir))
    props, _ = audit("pricing_summary", q(spark, sf_dir), codegen_plan=cg_plan)
    assert props["codegen_spans"] >= 1, cg_plan[:2000]
    assert "[codegen id :" in cg_plan
    assert "[codegen id :" not in aqe_plan
    assert props["flags"] == "-"


def test_codegen_floor_flags_blind_plan(spark, sf_dir):
    """A parquet-scanning JVM-only plan whose codegen twin shows zero
    spans is flagged NO-CODEGEN (the floor assertion): simulate format
    drift by passing a marker-free twin."""
    import __spark_entry__ as entrymod

    df = entrymod.queries()["pricing_summary"](spark, sf_dir)
    props, _ = audit(
        "pricing_summary", df, codegen_plan="Scan parquet (no markers)"
    )
    assert "NO-CODEGEN" in props["flags"]
