"""Driver-gate replica: every SQL-expressible query matches DuckDB."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"

from scripts.check_oracle import TABLES, compare, to_pandas  # noqa: E402


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


@pytest.fixture(scope="module")
def contract(ray_session):
    import __ray_entry__ as entrymod

    return entrymod.queries(), entrymod.oracle_sql()


def _oracle_names():
    from ocr_pipeline_ray.queries import ORACLE_SQL

    return sorted(ORACLE_SQL)


@pytest.mark.parametrize("name", _oracle_names())
def test_query_matches_oracle(name, duck, contract):
    queries, oracles = contract
    ray_df = to_pandas(queries[name](SF_DIR))
    sql_df = duck.sql(oracles[name]).df()
    problem = compare(name, ray_df, sql_df)
    assert not problem, f"{name}: {problem}"


def test_every_oracle_has_query(contract):
    queries, oracles = contract
    missing = set(oracles) - set(queries)
    assert not missing


def test_rows_only_queries_run(contract, ray_session):
    queries, oracles = contract
    for name in set(queries) - set(oracles):
        df = to_pandas(queries[name](SF_DIR))
        assert df is not None


def test_entry_smoke(ray_session):
    import __ray_entry__ as entrymod

    result = entrymod.entry()
    df = to_pandas(result)
    assert len(df) >= 0
    assert set(df.columns) == {
        "url", "extracted_text", "hit_ratio", "n_words", "n_errs"
    }
