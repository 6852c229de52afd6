"""ORC / JSON-lines / CSV sink-source roundtrips preserve rows and
types (with the explicit-schema discipline for text formats)."""

import pytest

from scrappy_spark.io import load_table
from scrappy_spark.sources.formats import read_table, write_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("fmt", ["orc", "json", "csv"])
def test_roundtrip_documents(spark, tmp_path, fmt):
    docs = load_table(spark, SF_DIR, "documents")
    path = str(tmp_path / f"docs_{fmt}")
    write_table(docs, path, fmt=fmt)
    back = read_table(spark, path, fmt=fmt, schema=docs.schema)
    assert back.schema == docs.schema
    assert back.count() == docs.count()
    assert docs.exceptAll(back).count() == 0
    assert back.exceptAll(docs).count() == 0


def test_partitioned_orc_prunes(spark, tmp_path):
    """Partitioned ORC sink: a source-filtered read scans only the
    matching partition directory (partition pruning at the file level)."""
    docs = load_table(spark, SF_DIR, "documents")
    path = str(tmp_path / "docs_part")
    write_table(docs, path, fmt="orc", partition_by=["source"])
    back = read_table(spark, path, fmt="orc").filter("source = 'src0'")
    plan = back._jdf.queryExecution().executedPlan().toString()
    import re

    assert re.search(r"PartitionFilters: \[.*source#\d+ = src0", plan)
    assert back.count() == docs.filter("source = 'src0'").count()


def test_text_read_without_schema_rejected(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    path = str(tmp_path / "docs_js")
    write_table(docs, path, fmt="json")
    with pytest.raises(ValueError, match="explicit schema"):
        read_table(spark, path, fmt="json")


def test_unknown_format_rejected(spark):
    docs = load_table(spark, SF_DIR, "documents")
    with pytest.raises(ValueError, match="unknown format"):
        write_table(docs, "/tmp/x", fmt="avro")
