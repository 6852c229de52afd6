"""Environment-drift lint for the events ``ts`` dtype.

The fixture writer has shipped three encodings of ``events.ts`` across
driver rounds: parquet TIMESTAMP(NANOS) (rounds 1-2), tz-naive
TIMESTAMP(isAdjustedToUTC=false) → Spark TIMESTAMP_NTZ (round 3, which
crashed the driver bench at ``unix_micros(ts)``), and plain UTC
TIMESTAMP. ``io._load_events`` normalizes all three to TIMESTAMP; this
lint builds EVERY declared query against a scratch fixture dir per
encoding so the next fixture-writer change surfaces as a named test
failure here, not a driver-bench crash.

Analysis-only where possible: we touch ``.schema`` (triggers full
Catalyst analysis, which is where ``unix_micros``/``withWatermark``
dtype errors raise) rather than executing jobs.
"""

import os
import shutil
import tempfile

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from scrappy_spark.io import load_table
from scrappy_spark.plans import registry
from scrappy_spark.schema import FIXTURE_TABLES

SF_DIR = "/root/testdata/sf0.001"

ENCODINGS = {
    # tz-naive micros — what the round-3 regenerated fixtures ship
    "ntz": lambda ts: pc.cast(ts, pa.timestamp("us")),
    # nanos-as-int64 physical — exercises the legacy nanosAsLong branch
    "nanos_long": lambda ts: pc.cast(pc.cast(ts, pa.timestamp("ns")), pa.int64()),
    # UTC-adjusted micros — the "normal" encoding, cast is a no-op
    "utc": lambda ts: pc.cast(ts, pa.timestamp("us", tz="UTC")),
}


def _scratch_sf_dir(encoding: str) -> str:
    """Scratch sf dir: symlink every table except events; rewrite events
    with ``ts`` re-encoded."""
    d = tempfile.mkdtemp(prefix=f"ntz_lint_{encoding}_")
    for t in FIXTURE_TABLES:
        if t != "events":
            os.symlink(os.path.join(SF_DIR, f"{t}.parquet"), os.path.join(d, f"{t}.parquet"))
    tab = pq.read_table(os.path.join(SF_DIR, "events.parquet"))
    ts = tab.column("ts")
    if ts.type.tz is None:
        # make re-encoding deterministic regardless of source flavor:
        # interpret naive micros as UTC first
        ts = pc.assume_timezone(pc.cast(ts, pa.timestamp("us")), "UTC")
    tab = tab.set_column(tab.schema.get_field_index("ts"), "ts", ENCODINGS[encoding](ts))
    pq.write_table(tab, os.path.join(d, "events.parquet"))
    return d


@pytest.fixture(scope="module", params=sorted(ENCODINGS))
def variant_dir(request):
    d = _scratch_sf_dir(request.param)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_load_events_normalizes_ts(spark, variant_dir):
    df = load_table(spark, variant_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp", (
        f"_load_events must yield TIMESTAMP ts, got {dict(df.dtypes)['ts']}"
    )
    # value identity vs the canonical fixture read (UTC session tz makes
    # every encoding the same instant)
    base = load_table(spark, SF_DIR, "events")
    a = df.selectExpr("min(unix_micros(ts)) m", "max(unix_micros(ts)) x", "count(*) n").first()
    b = base.selectExpr("min(unix_micros(ts)) m", "max(unix_micros(ts)) x", "count(*) n").first()
    assert tuple(a) == tuple(b)


def test_every_declared_query_analyzes_under_drift(spark, variant_dir):
    """Every declared query must pass Catalyst analysis against each ts
    encoding — this is exactly the check whose absence let the round-3
    fixture regeneration reach the driver bench as a crash."""
    from concurrent.futures import ThreadPoolExecutor

    def analyze(item):
        name, spec = item
        try:
            spec.fn(spark, variant_dir).schema
            return name, None
        except Exception as exc:  # noqa: BLE001 - lint collects all failures
            return name, str(exc).strip().splitlines()[0]

    # construction + analysis fanned over a driver thread pool (the
    # conftest build_all_queries pattern): each query is independent,
    # and the artifact-building queries' bounded jobs overlap.
    with ThreadPoolExecutor(max_workers=8) as pool:
        results = list(pool.map(analyze, registry.all_specs().items()))
    failures = {n: e for n, e in results if e is not None}
    assert not failures, failures
