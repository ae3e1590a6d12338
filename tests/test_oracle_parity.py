"""t2 gate replica: every registry query with an oracle must hash-match
DuckDB at sf0.01 (the driver's exact comparison scale)."""

from __future__ import annotations

import pytest

from robi_biometric_qdrant_vector_db_service_spark.workload import REGISTRY
from tests.conftest import SF_ORACLE
from tests.parity import check

ORACLE_QUERIES = sorted(name for name, spec in REGISTRY.items() if spec.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_parity(spark, name):
    errs = check(spark, name, REGISTRY[name], SF_ORACLE)
    assert not errs, "\n".join(errs)


def test_all_queries_return_rows(spark):
    for name, spec in REGISTRY.items():
        df = spec.run(spark, SF_ORACLE)
        assert df.count() >= 0, name
