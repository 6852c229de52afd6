"""Contract smoke: every declared query runs at sf0.001, returns a
stable schema, and every oracle SQL parses+runs in DuckDB. Full
value-parity runs via tools/verify_oracle.py (and the driver at sf0.01);
here we spot-check a representative subset end-to-end."""

import duckdb
import pytest

from scrappy_spark.plans import registry
from scrappy_spark.schema import FIXTURE_TABLES

SF_DIR = "/root/testdata/sf0.001"

SPOT_CHECK = [
    "q_groupby_sum_avg",
    "q_dedup_keep_first",
    "q_ngram_topk",
    "q_session_window_agg",
    "q_minhash_pairs",
    "q_embedding_cosine_topk",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def test_all_queries_run(spark, built_queries):
    assert len(built_queries) >= 40
    from concurrent.futures import ThreadPoolExecutor

    def smoke(item):
        name, df = item
        assert df.columns, name
        assert df.limit(1).count() >= 0, name
        return name

    # concurrent smoke actions back-fill each other's stragglers
    # (guide §2.6) — the queries are independent.
    with ThreadPoolExecutor(max_workers=8) as pool:
        done = list(pool.map(smoke, built_queries.items()))
    assert len(done) == len(built_queries)


def test_oracles_parse(duck):
    for name, sql in registry.oracle_sql().items():
        duck.sql(sql).fetchone()  # raises on dialect errors


@pytest.mark.parametrize("name", SPOT_CHECK)
def test_spot_parity(spark, duck, name):
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.verify_oracle import canonical_hash

    spec = registry.all_specs()[name]
    sdf = spec.fn(spark, SF_DIR).toPandas()
    odf = duck.sql(spec.sql).df()
    assert len(sdf) == len(odf)
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert canonical_hash(sdf) == canonical_hash(odf)
