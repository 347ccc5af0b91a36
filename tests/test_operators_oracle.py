"""Every registered operator with a DuckDB oracle must hash-match it at
sf0.001 (fast) — the local equivalent of the driver's t2 correctness gate.

Rows-only operators (no oracle) are smoke-checked: they run and return a
stable schema with >= 0 rows.
"""

from __future__ import annotations

import pytest

from hudi_acid_verification_spark import operators as ops
from tests.conftest import SF_SMALL
from tests.oracle_check import compare

ORACLED = sorted(ops.ORACLES)
ROWS_ONLY = sorted(set(ops.QUERIES) - set(ops.ORACLES))


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_parity(spark, name):
    df = ops.QUERIES[name](spark, SF_SMALL)
    compare(name, df, ops.ORACLES[name], SF_SMALL)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_smoke(spark, name):
    df = ops.QUERIES[name](spark, SF_SMALL)
    rows = df.collect()
    assert rows is not None
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
