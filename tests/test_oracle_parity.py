"""Every catalog query with an oracle must hash-match DuckDB — the local
replica of the driver's t2 correctness gate, run at sf0.001 for speed
(the driver runs sf0.01; test_oracle_parity_sf001 below is the same
check at the driver's scale, marked slow)."""

from __future__ import annotations

import pytest

from kafka_avro_order_processor_eg_4131_spark.catalog import REGISTRY

from .oracle_harness import compare_query, duckdb_conn


def _oracle_queries():
    return [(n, q) for n, q in sorted(REGISTRY.items()) if q.oracle is not None]


@pytest.fixture(scope="module")
def con_small(sf_small):
    con = duckdb_conn(sf_small)
    yield con
    con.close()


@pytest.fixture(scope="module")
def con_oracle(sf_oracle):
    con = duckdb_conn(sf_oracle)
    yield con
    con.close()


@pytest.mark.parametrize("name", [n for n, _ in _oracle_queries()])
def test_matches_oracle_sf0001(spark, con_small, sf_small, name):
    q = REGISTRY[name]
    res = compare_query(spark, con_small, name, q.fn, q.oracle, sf_small)
    assert res.ok, f"{name}: {res.problems}"


@pytest.mark.slow
@pytest.mark.parametrize("name", [n for n, _ in _oracle_queries()])
def test_matches_oracle_sf001(spark, con_oracle, sf_oracle, name):
    q = REGISTRY[name]
    res = compare_query(spark, con_oracle, name, q.fn, q.oracle, sf_oracle)
    assert res.ok, f"{name}: {res.problems}"


def test_rows_only_queries_run(spark, sf_small):
    for name, q in sorted(REGISTRY.items()):
        if q.oracle is None:
            df = q.fn(spark, sf_small)
            assert df.count() >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"status", "n_orders", "total_price", "avg_price"}
