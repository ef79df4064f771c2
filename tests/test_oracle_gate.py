"""Every registry query vs its DuckDB oracle at sf0.001 (fast mirror of
the driver's t2 gate; SURVEY.md §5 rebuild test plan)."""

from __future__ import annotations

import pytest

from uquery_rs_spark import queries as Q
from uquery_rs_spark.oracle import compare_query, oracle_connection

from .conftest import SF_SMALL

Q.load_all()


@pytest.fixture(scope="module")
def oracle_con():
    con = oracle_connection(SF_SMALL)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(Q.REGISTRY))
def test_query_matches_oracle(name, spark, oracle_con):
    q = Q.REGISTRY[name]
    passed, detail = compare_query(spark, oracle_con, q, SF_SMALL)
    assert passed, f"{name}: {detail}"
