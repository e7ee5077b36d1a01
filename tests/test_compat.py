"""Schema-registry compatibility modes (plans/registry.py): Confluent
semantics over Spark StructTypes — registration gates, promotion rules,
transitive checks, persistence of the mode."""

import pytest
from pyspark.sql import types as T

from data_pipeline_spark.plans.registry import (
    CompatibilityError,
    SchemaRegistry,
    _can_read,
)


def _s(*fields):
    return T.StructType([T.StructField(n, t, nullable=nul) for n, t, nul in fields])


V1 = _s(("url", T.StringType(), False), ("warc_ts", T.TimestampType(), True),
        ("n", T.IntegerType(), True))
# adds a nullable column + widens n: backward AND forward? widening is
# backward-safe (new reads old int as long) but forward-UNSAFE (old int
# reader cannot read new bigint)
V2_WIDEN = _s(("url", T.StringType(), False), ("warc_ts", T.TimestampType(), True),
              ("n", T.LongType(), True), ("lang", T.StringType(), True))
# drops a nullable column: backward-safe; adds required column: backward-UNSAFE
V2_REQ = _s(("url", T.StringType(), False), ("n", T.IntegerType(), True),
            ("must", T.StringType(), False))


def test_can_read_rules():
    assert _can_read(V2_WIDEN, V1) == []  # widen + nullable add: readable
    bad = _can_read(V1, V2_WIDEN)
    assert any("cannot read bigint as int" in m for m in bad)
    assert any("required field 'must'" in m for m in _can_read(V2_REQ, V1))
    # nullability tightening is flagged
    loose = _s(("url", T.StringType(), True))
    tight = _s(("url", T.StringType(), False))
    assert any("may write null" in m for m in _can_read(tight, loose))
    assert _can_read(loose, tight) == []


def test_backward_gate():
    reg = SchemaRegistry(table_schemas={1: V1}, compatibility="BACKWARD")
    reg.register_version(2, V2_WIDEN)  # widening is backward-compatible
    with pytest.raises(CompatibilityError, match="required field 'must'"):
        reg.register_version(3, V2_REQ)
    assert 3 not in reg.table_schemas  # registry unchanged on refusal


def test_forward_gate_rejects_widening():
    reg = SchemaRegistry(table_schemas={1: V1}, compatibility="FORWARD")
    with pytest.raises(CompatibilityError, match="cannot read bigint as int"):
        reg.register_version(2, V2_WIDEN)
    # dropping a nullable column is forward-safe (old reads new's nulls)…
    dropped = _s(("url", T.StringType(), False), ("n", T.IntegerType(), True))
    reg.register_version(2, dropped)


def test_full_transitive_checks_all_versions():
    reg = SchemaRegistry(
        table_schemas={1: V1, 2: V2_WIDEN}, compatibility="BACKWARD_TRANSITIVE"
    )
    # compatible with v2 but NOT with v1 (drops url entirely, non-null n)
    v3 = _s(("n", T.LongType(), False),)
    errs = reg.check_compatibility(v3, version=3)
    assert any("vs v1" in e for e in errs) and any("vs v2" in e for e in errs)


def test_none_mode_accepts_anything():
    reg = SchemaRegistry(table_schemas={1: V1})
    reg.register_version(2, V2_REQ)
    assert 2 in reg.table_schemas


def test_mode_persists_through_json():
    reg = SchemaRegistry(table_schemas={1: V1}, compatibility="FULL")
    back = SchemaRegistry.from_json(reg.to_json())
    assert back.compatibility == "FULL"
    with pytest.raises(CompatibilityError):
        back.register_version(2, V2_WIDEN)  # widening fails FULL's forward leg


def test_unknown_mode_rejected():
    with pytest.raises(ValueError, match="unknown compatibility mode"):
        SchemaRegistry(compatibility="SIDEWAYS")
