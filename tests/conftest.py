from __future__ import annotations

import datetime
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from scrappy_spark.schema import ARTICLES_SCHEMA

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    from scrappy_spark.session import get_spark

    s = get_spark("scrappy_spark_tests")
    yield s


def build_all_queries(spark, sf_dir: str, max_workers: int = 8) -> dict:
    """Construct every declared query against ``sf_dir`` on a driver
    thread pool (guide §2.6: Spark happily runs concurrent jobs; the
    iterative queries run bounded actions at construction time, and
    issuing them from several threads lets the next query's jobs
    back-fill the current one's stragglers). Construction is the
    dominant cost of every registry-wide contract test (~95-140 s per
    sequential pass at sf0.001), so the suite builds the canonical dir
    ONCE (see ``built_queries``) and shares the dict."""
    from concurrent.futures import ThreadPoolExecutor

    from scrappy_spark.plans import registry

    specs = registry.all_specs()

    def build(item):
        name, spec = item
        return name, spec.fn(spark, sf_dir)

    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        return dict(pool.map(build, specs.items()))


@pytest.fixture(scope="session")
def built_queries(spark) -> dict:
    """name -> DataFrame for every declared query at the canonical
    SF_DIR, built once per session. Tests that only need schemas,
    plans, or a smoke action reuse these instead of paying a full
    construction pass each."""
    return build_all_queries(spark, SF_DIR)


def _d(y: int, m: int, day: int) -> datetime.date:
    return datetime.date(y, m, day)


@pytest.fixture(scope="session")
def articles(spark):
    """In-repo articles fixture (FIXTURES.md §B): edge rows exercising
    each cited reference behavior."""
    rows = [
        # 1. null abstract (P1 na=False path, article_querry.py:16-17)
        ("IEEE", "Deep Learning for Threat Detection", None, "http://a/1",
         ["Ada"], [["MIT"]], ["deep learning", "security"], "threat ai", 2021, _d(2024, 1, 1)),
        # 2/3. duplicate title across sources and within batch (D1/D2)
        ("arXiv", "Graph Neural Networks Survey", "A survey of GNN methods.", "http://a/2",
         ["Bob"], [["CMU"]], [], "gnn", 2020, _d(2024, 1, 1)),
        ("PubMed", "Graph Neural Networks Survey", "Duplicate from PubMed.", "",
         [], [["NIH", "WHO"]], [], "gnn", None, _d(2024, 1, 2)),
        ("IEEE", "Graph Neural Networks Survey", "Dup within batch.", "http://a/3",
         ["Cy"], [[]], ["graphs"], "gnn", 2020, _d(2024, 1, 1)),
        # 4. nested multi-affiliation institutions (P11, scrappy.py:318-320)
        ("SemanticScholar", "Healthcare Infrastructure Security", "Hospital networks face threats.",
         "http://a/4", ["Dee", "Eli"], [["Stanford", "VA Hospital"], ["Oxford"]],
         [], "healthcare security", 2022, _d(2024, 1, 3)),
        # 5. null year alongside int years (P3, article_querry.py:22-23)
        ("arXiv", "Quantum Error Correction", "Surface codes in practice.", "http://a/5",
         ["Fay"], [[]], [], "quantum", None, _d(2024, 1, 3)),
        # 6. populated keywords vs empty (P2 array filter)
        ("IEEE", "Edge Computing Platforms", "Latency-sensitive workloads at the edge.",
         "http://a/6", ["Gus"], [["ETH"]], ["edge computing", "iot"], "edge", 2023, _d(2024, 1, 4)),
        # 9. abstract > 100 chars (P12 truncation, scrappy.py:385)
        ("GoogleScholar", "A Very Long Abstract Paper",
         "x" * 150, "http://a/7", [], [[]], [], "long", 2019, _d(2024, 1, 4)),
    ]
    return spark.createDataFrame(rows, ARTICLES_SCHEMA)
