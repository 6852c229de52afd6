"""CLI — the reference's argparse surface (``scrappy.py:608-623``)
re-expressed over the engine, so a user of the reference can run the
same five flows:

  --fetch-articles   EP2 ingest → store merge (scrappy.py:545-551)
  --query-articles   EP1 filter query        (scrappy.py:571-589)
  --suggest-terms    mining + classifier     (scrappy.py:553-569)
  --build-taxonomy   EP3 clustering          (scrappy.py:591-600)
  --build-tree       G1 keyword DFS          (scrappy.py:531-543)

Differences by design: the store is parquet (not CSV), interactive
stdin approval is a flag (--yes), and live HTTP needs ``requests`` +
API keys (absent in CI, where tests inject recorded fetchers).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from pyspark.sql import functions as F

from .ml.classifier import classify_terms, train_classifier
from .ml.contextualize import contextualize_terms
from .ml.taxonomy import build_taxonomy
from .operators.filters import filter_articles, truncate_col
from .operators.mining import top_terms
from .session import get_spark
from .sources.fetch import collect_all_articles
from .sources.normalizers import NORMALIZERS
from .sources.store import ArticleStore
from .tree import build_topic_tree, edges_to_nested

DEFAULT_STORE = "articles_store"
DEFAULT_TERMS_FILE = "search_terms.json"


def _http_fetcher(api_keys: dict[str, str]):
    """Live-HTTP fetcher (network deployments only). Import-gated:
    raises a clear error when ``requests`` is unavailable rather than
    failing at import time."""
    try:
        import requests  # noqa: F401
    except ImportError as exc:  # pragma: no cover - no network in CI
        raise SystemExit(
            "live fetching needs the 'requests' package and API keys; "
            "in offline environments use the Python API with an injected fetcher"
        ) from exc

    def fetch(source: str, term: str) -> str | None:  # pragma: no cover
        import requests

        urls = {
            "IEEE": (
                "https://ieeexploreapi.ieee.org/api/v1/search/articles",
                {"querytext": term, "apikey": api_keys.get("ieee", ""), "max_records": 200},
            ),
            "SemanticScholar": (
                "https://api.semanticscholar.org/graph/v1/paper/search",
                {"query": term, "fields": "title,abstract,url,year,authors.name,authors.affiliations", "limit": 100},
            ),
            "GoogleScholar": (
                "https://serpapi.com/search",
                {"engine": "google_scholar", "q": term, "api_key": api_keys.get("serpapi", "")},
            ),
            "arXiv": (
                "http://export.arxiv.org/api/query",
                {"search_query": f"all:{term}", "max_results": 200},
            ),
        }
        if source == "PubMed":
            base = "https://eutils.ncbi.nlm.nih.gov/entrez/eutils"
            ids = requests.get(
                f"{base}/esearch.fcgi",
                params={"db": "pubmed", "term": term, "retmax": 200, "retmode": "json"},
                timeout=30,
            ).json().get("esearchresult", {}).get("idlist", [])
            if not ids:
                return None
            return requests.get(
                f"{base}/efetch.fcgi",
                params={"db": "pubmed", "id": ",".join(ids), "retmode": "xml"},
                timeout=60,
            ).text
        url, params = urls[source]
        resp = requests.get(url, params=params, timeout=30)
        resp.raise_for_status()
        return resp.text

    return fetch


def _open_index(spark, path: str):
    """Open a stored index by path, auto-detecting the family from its
    meta.json parameter fingerprint (each family's meta keys are
    disjoint). Returns ``(index, kind, {table name: SnapshotTable})``
    or ``None`` when no complete index lives there (meta lands last,
    so meta.json missing means no readable index)."""
    meta_path = os.path.join(path, "meta.json")
    if not os.path.isfile(meta_path):
        return None
    with open(meta_path) as f:
        meta = json.load(f)
    if "min_len" in meta:
        from .operators.stored_indexes import GramIndex

        idx = GramIndex(spark, path)
        return idx, "gram", {"ledger": idx.ledger}
    if "num_hashes" in meta:
        from .operators.stored_indexes import MinHashIndex

        idx = MinHashIndex(spark, path)
        return idx, "minhash", {"sigs": idx.sigs, "tombs": idx.tombstones}
    if "ksub" in meta:
        from .operators.ann_index import IvfPqIndex

        idx = IvfPqIndex(spark, path)
        return (
            idx,
            "ivfpq",
            {
                "cells": idx.cells,
                "codebook": idx.codebook,
                "codes": idx._codes,
                "tombs": idx.tombstones,
            },
        )
    return None


def _load_terms(path: str) -> list[str]:
    if os.path.exists(path):
        with open(path) as f:
            return list(json.load(f))
    return []


#: reference --tree-api values (scrappy.py:612) → engine source names
TREE_API_SOURCES = {
    "semantic_scholar": "SemanticScholar",
    "pubmed": "PubMed",
    "arxiv": "arXiv",
}

# recorded-payload filenames per source: single source of truth shared
# with the scrappy_articles DataSource
from .sources.datasource import PAYLOAD_FILES  # noqa: E402


def _payload_dir_fetcher(payload_dir: str):
    """Offline fetcher: serves recorded payload files (one per source)
    for every term — the CLI path that needs neither network nor the
    ``requests`` package (mirrors how the test suite injects payloads)."""

    def fetch(source: str, term: str) -> str | None:
        path = os.path.join(payload_dir, PAYLOAD_FILES[source])
        if not os.path.exists(path):
            return None
        with open(path, encoding="utf-8") as f:
            return f.read()

    return fetch


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="scrappy-spark")
    p.add_argument("--store", default=DEFAULT_STORE)
    p.add_argument("--terms-file", default=DEFAULT_TERMS_FILE)
    p.add_argument("--fetch-articles", action="store_true")
    p.add_argument(
        "--import-csv",
        metavar="CSV_PATH",
        help="migrate a reference-format raw_articles.csv into the store",
    )
    p.add_argument("--query-articles", action="store_true")
    p.add_argument("--suggest-terms", action="store_true")
    p.add_argument("--build-taxonomy", action="store_true")
    p.add_argument("--build-tree", action="store_true")
    p.add_argument(
        "--tree-api",
        choices=sorted(TREE_API_SOURCES),
        default="semantic_scholar",
        help="source for --build-tree (reference scrappy.py:612, same "
        "choices and default)",
    )
    p.add_argument(
        "--payload-dir",
        metavar="DIR",
        help="offline mode: read recorded API payloads from DIR instead "
        "of live HTTP (files named as in tests/payloads)",
    )
    p.add_argument("--term")
    p.add_argument("--institution")
    p.add_argument("--year")
    p.add_argument("--keyword")
    p.add_argument("--limit", type=int, default=10)
    p.add_argument("--depth", type=int, default=2)
    p.add_argument("--topics", type=int, default=8)
    p.add_argument("--yes", action="store_true", help="non-interactive approval")
    p.add_argument("--output", default="taxonomy_output.parquet")
    p.add_argument("--tree-output", default="topic_tree.json")
    p.add_argument(
        "--compact-store",
        action="store_true",
        help="rewrite fragmented store partitions into single files",
    )
    p.add_argument(
        "--sql", help="run a Spark SQL query (store as 'articles'; fixture tables via --sf-dir)"
    )
    p.add_argument("--sf-dir", help="fixture-table dir to register for --sql")
    p.add_argument(
        "--register-snapshot",
        action="append",
        metavar="NAME=PATH[@VERSION|@ts:EPOCH]",
        help="register a snapshot table as a SQL view for --sql "
        "(repeatable; @N pins a version, @ts:EPOCH pins a timestamp "
        "— TIMESTAMP AS OF; default HEAD)",
    )
    p.add_argument(
        "--table",
        metavar="PATH",
        help="snapshot-table path for the --table-* admin commands",
    )
    p.add_argument(
        "--table-history",
        action="store_true",
        help="list a snapshot table's versions (message, files, pending "
        "row-level deletes)",
    )
    p.add_argument(
        "--table-delete-where",
        nargs=3,
        metavar=("COL", "OP", "VALUE"),
        help="row-level takedown by predicate (merge-on-read; ops "
        "= < <= > >=; numeric VALUE auto-cast)",
    )
    p.add_argument(
        "--table-delete-keys",
        metavar="PARQUET",
        help="row-level takedown by key list read from PARQUET "
        "(requires --key-col)",
    )
    p.add_argument(
        "--table-merge-keys",
        metavar="PARQUET",
        help="single-commit keyed upsert: the PARQUET batch replaces "
        "matched keys and inserts the rest (requires --key-col)",
    )
    p.add_argument(
        "--merge-condition",
        metavar="SQL",
        help="WHEN MATCHED AND <cond> for --table-merge-keys — a SQL "
        "boolean over the pair (table row as t, batch row as b), e.g. "
        "\"b.score > t.score\"; failing matches keep current values",
    )
    p.add_argument(
        "--update-cols",
        metavar="COLS",
        help="comma-separated column subset for --table-merge-keys: "
        "matched rows update ONLY these columns, keeping the rest",
    )
    p.add_argument(
        "--key-col",
        help="key column for --table-delete-keys / --table-merge-keys",
    )
    p.add_argument(
        "--table-apply-deletes",
        action="store_true",
        help="materialize pending row-level deletes (rewrites only the "
        "scoped files)",
    )
    p.add_argument(
        "--table-describe",
        action="store_true",
        help="print the table's head-version metadata: schema with "
        "column ids, partition spec(s), stats/bloom designations, "
        "pending deletes, file count",
    )
    p.add_argument(
        "--table-expire",
        type=int,
        metavar="KEEP_LAST",
        help="drop all but the last N versions and GC unreferenced "
        "data files (see --grace-sec for the orphan age gate)",
    )
    p.add_argument(
        "--grace-sec",
        type=float,
        default=86400.0,
        metavar="SEC",
        help="orphan age gate for --table-expire: unreferenced files "
        "younger than this survive (a concurrent writer's staged "
        "commit is indistinguishable from a crash orphan); 0 sweeps "
        "immediately (default 86400)",
    )
    p.add_argument(
        "--table-compact",
        type=int,
        metavar="TARGET_MB",
        help="rewrite the table's small files into ~TARGET_MB bins as "
        "one atomic commit (single-file bins are reused, not "
        "rewritten)",
    )
    p.add_argument(
        "--branch",
        default="main",
        metavar="NAME",
        help="scope every --table-* command to this branch's manifest "
        "line (default main)",
    )
    p.add_argument(
        "--table-create-branch",
        metavar="NAME[@VERSION]",
        help="fork a branch from --branch at VERSION (default its "
        "head) — one metadata commit, data files shared",
    )
    p.add_argument(
        "--table-drop-branch",
        metavar="NAME",
        help="delete a branch's manifest line (its exclusive data "
        "files are reclaimed by the next aged --table-expire)",
    )
    p.add_argument(
        "--table-tag",
        metavar="NAME[@VERSION]",
        help="pin (--branch, VERSION) under an immutable tag name "
        "(default: the branch head); protects the version from "
        "--table-expire",
    )
    p.add_argument(
        "--table-delete-tag",
        metavar="NAME",
        help="remove a tag (retarget = delete + re-tag, never silent)",
    )
    p.add_argument(
        "--table-refs",
        action="store_true",
        help="list the table's branches (with heads) and tags",
    )
    p.add_argument(
        "--table-fast-forward",
        metavar="NAME",
        help="advance --branch to branch NAME's head state (one "
        "metadata commit; refuses unless NAME forked from --branch "
        "and it has not advanced since — see --force)",
    )
    p.add_argument(
        "--force",
        action="store_true",
        help="allow --table-fast-forward as an explicit snapshot-level "
        "replace when histories diverged",
    )
    p.add_argument(
        "--table-add-blooms",
        metavar="COLS",
        help="backfill per-file Bloom filters on the comma-separated "
        "columns (scans only files missing one; metadata-only "
        "commit) — how a DataSource-written table gains the "
        "point-lookup pruning axis",
    )
    p.add_argument(
        "--table-rollback",
        type=int,
        metavar="VERSION",
        help="make VERSION's state the new head as one metadata "
        "commit (the bad commits stay in history until "
        "--table-expire)",
    )
    p.add_argument(
        "--dry-run",
        action="store_true",
        help="with --table-expire: report what would be dropped and "
        "deleted without touching anything",
    )
    p.add_argument(
        "--table-commit",
        metavar="PARQUET",
        help="commit the PARQUET file/dir as the table's next version "
        "on --branch (replace; see --append, --partition-spec, "
        "--stats-cols, --bloom-cols)",
    )
    p.add_argument(
        "--append",
        action="store_true",
        help="make --table-commit an append (parent files + new) "
        "instead of a replace",
    )
    p.add_argument(
        "--partition-spec",
        metavar="SPEC",
        help="partition --table-commit by comma-separated fields "
        "'col', 'col:bucket:N' or 'col:truncate:W' (e.g. "
        "'lang,doc_id:bucket:8'); an append under a new spec EVOLVES "
        "the table's spec, old files keep pruning under theirs",
    )
    p.add_argument(
        "--stats-cols",
        metavar="COLS",
        help="record per-file [min,max] stats for these comma-"
        "separated columns with --table-commit",
    )
    p.add_argument(
        "--bloom-cols",
        metavar="COLS",
        help="build per-file Bloom filters for these comma-separated "
        "columns with --table-commit (unpartitioned commits only)",
    )
    p.add_argument(
        "--index",
        metavar="PATH",
        help="stored-index path for the --index-* admin commands "
        "(GramIndex / MinHashIndex / IvfPqIndex — the family is "
        "auto-detected from meta.json)",
    )
    p.add_argument(
        "--index-history",
        action="store_true",
        help="list every underlying snapshot table's versions for a "
        "stored index",
    )
    p.add_argument(
        "--index-delete",
        metavar="IDS",
        help="index takedown: comma-separated integer ids (tombstone / "
        "refcount negation); the gram index also needs --table (the "
        "corpus snapshot) to resolve the docs' text",
    )
    p.add_argument(
        "--index-vacuum",
        action="store_true",
        help="physically reclaim deleted rows (recommit live state)",
    )
    p.add_argument(
        "--run-pipeline",
        help="JSON pipeline spec (file path or inline JSON; see "
        "pipeline_config.py) applied to --pipeline-input parquet",
    )
    p.add_argument("--pipeline-input", help="input parquet path for --run-pipeline")
    p.add_argument(
        "--pipeline-output",
        help="output parquet path for --run-pipeline (default: show)",
    )
    args = p.parse_args(argv)

    spark = get_spark("scrappy_spark_cli")
    store = ArticleStore(spark, args.store)

    if args.index_history or args.index_delete or args.index_vacuum:
        # the takedown story, drivable end-to-end from the CLI like
        # the --table-* story (VERDICT r11 #6)
        if not args.index:
            print("--index PATH is required for index admin", file=sys.stderr)
            return 2
        opened = _open_index(spark, args.index)
        if opened is None:
            print(
                f"no stored index at {args.index} (meta.json missing or "
                "unrecognized)",
                file=sys.stderr,
            )
            return 2
        idx, kind, tables = opened
        if args.index_delete:
            ids = [int(x) for x in args.index_delete.split(",") if x.strip()]
            if kind == "gram":
                if not args.table:
                    print(
                        "--index-delete on a gram index needs --table "
                        "(the corpus snapshot holding the docs' text)",
                        file=sys.stderr,
                    )
                    return 2
                from .sources.snapshots import SnapshotTable

                corpus = SnapshotTable(spark, args.table).read()
                docs = corpus.filter(
                    F.col(idx.meta["id_col"]).isin(*ids)
                )
                # loud-fail, never silently skip: an id whose corpus
                # row is gone has unrecoverable text — its grams
                # cannot be retracted (the stream_takedown contract)
                got = {
                    int(r[0])
                    for r in docs.select(idx.meta["id_col"])
                    .distinct()
                    .collect()  # request-sized
                }
                absent = sorted(set(ids) - got)
                if absent:
                    print(
                        f"ids {absent[:5]} absent from the --table "
                        "corpus — their text is unrecoverable, gram "
                        "retraction cannot proceed",
                        file=sys.stderr,
                    )
                    return 2
                m = idx.delete(docs)
            else:
                m = idx.delete(ids)
            print(
                f"{kind} index: takedown of {len(ids)} id(s) committed "
                f"(v{m['version']})"
            )
        if args.index_vacuum:
            m = idx.vacuum()
            print(f"{kind} index: vacuumed (v{m['version']})")
        if args.index_history:
            for tname, t in tables.items():
                for m in t.versions():
                    print(
                        f"{tname} v{m['version']}: {m['n_files']} files"
                        + (f" — {m['message']}" if m.get("message") else "")
                    )
        return 0

    if (
        args.table_history
        or args.table_delete_where
        or args.table_delete_keys
        or args.table_merge_keys
        or args.table_apply_deletes
        or args.table_expire is not None
        or args.table_compact is not None
        or args.table_describe
        or args.table_create_branch
        or args.table_drop_branch
        or args.table_tag
        or args.table_delete_tag
        or args.table_refs
        or args.table_fast_forward
        or args.table_add_blooms
        or args.table_commit
        or args.table_rollback is not None
    ):
        from .sources.snapshots import SnapshotTable

        if not args.table:
            print("--table PATH is required for table admin", file=sys.stderr)
            return 2
        table = SnapshotTable(spark, args.table, branch=args.branch)

        def _name_at(spec: str) -> tuple[str, int | None]:
            name, _, raw = spec.partition("@")
            if raw and not raw.isdigit():
                print(
                    f"bad ref spec {spec!r}: the @suffix must be a "
                    "non-negative integer version",
                    file=sys.stderr,
                )
                raise SystemExit(2)
            return name, (int(raw) if raw else None)

        def _cols(raw: str | None) -> list[str] | None:
            out = [c.strip() for c in (raw or "").split(",") if c.strip()]
            return out or None

        if args.table_commit:
            df = spark.read.parquet(args.table_commit)
            if args.partition_spec:
                fields = []
                for raw in args.partition_spec.split(","):
                    bits = raw.strip().split(":")
                    if len(bits) == 1:
                        fields.append((bits[0], "identity", None))
                    elif len(bits) == 3 and bits[1] in ("bucket", "truncate"):
                        fields.append((bits[0], bits[1], int(bits[2])))
                    else:
                        print(
                            f"bad --partition-spec field {raw!r} (use "
                            "'col', 'col:bucket:N' or 'col:truncate:W')",
                            file=sys.stderr,
                        )
                        return 2
                if args.bloom_cols:
                    print(
                        "--bloom-cols is not supported with "
                        "--partition-spec; run --table-add-blooms after",
                        file=sys.stderr,
                    )
                    return 2
                m = table.commit_partitioned_multi(
                    df,
                    fields,
                    append=args.append,
                    stats_cols=_cols(args.stats_cols),
                )
            else:
                m = table.commit(
                    df,
                    append=args.append,
                    stats_cols=_cols(args.stats_cols),
                    bloom_cols=_cols(args.bloom_cols),
                )
            print(
                f"committed v{m['version']} on {table.branch} — "
                f"{m['n_files']} file(s)"
            )

        if args.table_create_branch:
            name, at = _name_at(args.table_create_branch)
            b = table.create_branch(name, version=at)
            print(
                f"branch {name} forked from {table.branch}@"
                f"{b._manifest(0)['forked_from']['version']}"
            )
        if args.table_drop_branch:
            table.drop_branch(args.table_drop_branch)
            print(f"branch {args.table_drop_branch} dropped")
        if args.table_tag:
            name, at = _name_at(args.table_tag)
            t = table.tag(name, version=at)
            print(f"tag {name} -> {t['branch']}@{t['version']}")
        if args.table_delete_tag:
            table.delete_tag(args.table_delete_tag)
            print(f"tag {args.table_delete_tag} deleted")
        if args.table_fast_forward:
            m = table.fast_forward(args.table_fast_forward, force=args.force)
            print(
                f"{table.branch} fast-forwarded to "
                f"{args.table_fast_forward}@"
                f"{m['merged_from']['version']} as v{m['version']}"
            )
        if args.table_add_blooms:
            cols = _cols(args.table_add_blooms) or []
            m = table.add_blooms(cols)
            print(
                f"blooms on {cols} backfilled across "
                f"{len(m.get('blooms', {}))} file(s) as v{m['version']}"
            )
        if args.table_refs:
            for b in table.branches():
                head = table.for_branch(b).current_version()
                print(f"branch {b} @ v{head}")
            for name, t in table.tags().items():
                print(f"tag {name} -> {t['branch']}@{t['version']}")
        if args.table_delete_where:
            col, op, raw = args.table_delete_where
            val: object = raw
            try:
                val = int(raw)
            except ValueError:
                try:
                    val = float(raw)
                except ValueError:
                    pass
            m = table.delete_where((col, op, val))
            print(
                f"v{m['version']}: delete where {col} {op} {val!r} — "
                f"{m['n_files']} files remain, "
                f"{len(m.get('deletes', []))} pending entr(ies)"
            )
        if args.table_delete_keys:
            if not args.key_col:
                print("--table-delete-keys requires --key-col", file=sys.stderr)
                return 2
            keys = spark.read.parquet(args.table_delete_keys)
            m = table.delete_keys(keys, [args.key_col])
            print(
                f"v{m['version']}: key takedown on {args.key_col} — "
                f"{len(m.get('deletes', []))} pending entr(ies)"
            )
        if args.table_merge_keys:
            if not args.key_col:
                print("--table-merge-keys requires --key-col", file=sys.stderr)
                return 2
            batch = spark.read.parquet(args.table_merge_keys)
            m = table.merge_keys(
                batch,
                [args.key_col],
                matched_condition=args.merge_condition,
                update_cols=(
                    [c.strip() for c in args.update_cols.split(",") if c.strip()]
                    if args.update_cols
                    else None
                ),
            )
            print(
                f"v{m['version']}: merge upsert on {args.key_col} — "
                f"{m['n_files']} files, "
                f"{len(m.get('deletes', []))} pending entr(ies)"
            )
        if args.table_apply_deletes:
            m = table.apply_deletes()
            print(
                f"v{m['version']}: deletes materialized — "
                f"{m['n_files']} files, 0 pending"
            )
        if args.table_compact is not None:
            from .operators.layout import compact_snapshot

            _, m = compact_snapshot(
                table, args.table_compact * 1024 * 1024, unit="bytes"
            )
            print(
                f"v{m['version']}: compacted to {m['n_files']} files "
                f"(target {args.table_compact} MB)"
            )
        if args.table_rollback is not None:
            m = table.rollback(args.table_rollback)
            print(
                f"{table.branch} rolled back to v{args.table_rollback} "
                f"as v{m['version']}"
            )
        if args.table_expire is not None:
            rep = table.expire(
                keep_last=args.table_expire,
                orphan_grace_sec=args.grace_sec,
                dry_run=args.dry_run,
            )
            verb = "would expire" if args.dry_run else "expired"
            print(
                f"{verb} versions {rep['dropped_versions']} — "
                f"{len(rep['deleted_files'])} data file(s) "
                f"{'would be ' if args.dry_run else ''}deleted "
                f"(orphan grace {args.grace_sec:g}s)"
            )
        if args.table_describe:
            v = table.current_version()
            if v is None:
                print("table has no commits")
            else:
                m = table._manifest(v)
                print(f"version {v} — {m['n_files']} file(s)")
                by_id = {c["id"]: c for c in m.get("columns", [])}
                stats_ids = set(m.get("stats_ids", []))
                bloom_ids = set(m.get("bloom_ids", []))
                for c in m.get("columns", []):
                    from .sources.snapshots import _struct_of

                    t = _struct_of([c]).fields[0].dataType.simpleString()
                    marks = []
                    if c["id"] in stats_ids:
                        marks.append("stats")
                    if c["id"] in bloom_ids:
                        marks.append("bloom")
                    tail = f" [{', '.join(marks)}]" if marks else ""
                    print(f"  col {c['id']}: {c['name']} {t}{tail}")
                specs = m.get("partition_specs") or (
                    {"-": m["partition_spec"]}
                    if "partition_spec" in m
                    else {}
                )
                cur = m.get("partition_spec_id", "-")
                def _fmt(f):
                    name = by_id.get(f["id"], {}).get("name", f["id"])
                    detail = (
                        f"bucket({f['n']})"
                        if f["transform"] == "bucket"
                        else (
                            f"truncate({f['width']})"
                            if f["transform"] == "truncate"
                            else "identity"
                        )
                    )
                    return f"{detail} on {name}"

                for sid, sp in specs.items():
                    flds = sp["fields"] if "fields" in sp else [sp]
                    star = " (current)" if sid == cur or sid == "-" else ""
                    print(
                        f"  spec {sid}: "
                        + ", ".join(_fmt(f) for f in flds)
                        + star
                    )
                pend = m.get("deletes", [])
                if pend:
                    print(f"  {len(pend)} pending row-level delete(s)")
        if args.table_history:
            for m in table.versions():
                pend = len(m.get("deletes", []))
                print(
                    f"v{m['version']}: {m['n_files']} files"
                    + (f", {pend} pending delete(s)" if pend else "")
                    + (f" — {m['message']}" if m.get("message") else "")
                )
        return 0

    if args.run_pipeline:
        from .pipeline_config import run_pipeline

        if not args.pipeline_input:
            print("--run-pipeline requires --pipeline-input", file=sys.stderr)
            return 2
        out = run_pipeline(
            spark.read.parquet(args.pipeline_input), args.run_pipeline
        )
        if args.pipeline_output:
            out.write.mode("overwrite").parquet(args.pipeline_output)
            print(f"wrote {spark.read.parquet(args.pipeline_output).count()} rows "
                  f"to {args.pipeline_output}")
        else:
            out.show(args.limit, truncate=False)
        return 0

    if args.sql:
        from .sqlapi import run_sql

        run_sql(
            spark,
            args.sql,
            sf_dir=args.sf_dir,
            store_path=args.store,
            snapshots=args.register_snapshot,
        ).show(args.limit, truncate=False)
        return 0

    if args.compact_store:
        report = store.compact()
        for part, (before, after) in sorted(report.items()):
            print(f"{part}: {before} -> {after} files")
        print(f"compacted {len(report)} partition(s)")
        return 0

    if args.import_csv:
        from .sources.store import import_legacy_csv

        imported = import_legacy_csv(spark, args.import_csv)
        report = store.merge(imported)
        print(f"imported {imported.count()} rows; newly added: {report.count()}")
        return 0

    if args.query_articles:
        out = filter_articles(
            store.read(), term=args.term, institution=args.institution,
            year=args.year, keyword=args.keyword, limit=args.limit,
        ).withColumn("abstract", truncate_col(F.col("abstract"), 100))
        out.select("title", "source", "year", "abstract").show(args.limit, truncate=False)
        return 0

    if args.fetch_articles:
        keys = {k.lower().replace("scrappy_key_", ""): v
                for k, v in os.environ.items() if k.startswith("SCRAPPY_KEY_")}
        terms = _load_terms(args.terms_file)
        if not terms:
            print(f"no terms in {args.terms_file}", file=sys.stderr)
            return 2
        fetcher = (
            _payload_dir_fetcher(args.payload_dir)
            if args.payload_dir
            else _http_fetcher(keys)
        )
        batch = collect_all_articles(spark, terms, fetcher)
        report = store.merge(batch)
        print(f"newly added: {report.count()}")
        report.select("title", "source").show(50, truncate=False)
        return 0

    if args.suggest_terms:
        arts = store.read()
        text = F.concat_ws(" ", F.coalesce("title", F.lit("")), F.coalesce("abstract", F.lit("")))
        mined = top_terms(arts.select(text.alias("text")), ngram_range=(1, 3), k=100)
        saved = spark.createDataFrame([(t.lower(),) for t in _load_terms(args.terms_file)] or [("",)], ["term"])
        fresh = mined.join(F.broadcast(saved), "term", "left_anti").limit(args.limit)
        model = train_classifier(spark)
        classified = classify_terms(model, fresh.select("term"))
        suggestions = contextualize_terms(spark, classified)
        suggestions.show(100, truncate=False)
        if args.yes:
            new_terms = sorted({r.search_string for r in suggestions.collect()})
            merged = sorted(set(_load_terms(args.terms_file)) | set(new_terms))
            with open(args.terms_file, "w") as f:
                json.dump(merged, f, indent=1)
            print(f"saved {len(new_terms)} suggestions to {args.terms_file}")
        return 0

    if args.build_taxonomy:
        arts = store.read()
        text = F.concat_ws(" ", F.coalesce("title", F.lit("")), F.coalesce("abstract", F.lit("")))
        out = build_taxonomy(arts.withColumn("text", text), k=args.topics)
        cols = out.select("title", "Topic", "topic_keywords")
        if args.output.endswith(".csv"):
            # reference-compatible CSV export (taxonomy_output.csv,
            # scrappy.py:598): array column joined for the flat format
            cols.withColumn(
                "topic_keywords", F.array_join("topic_keywords", ", ")
            ).write.mode("overwrite").option("header", True).csv(args.output)
        else:
            cols.write.mode("overwrite").parquet(args.output)
        # word-cloud weights artifact (the reference renders wordcloud.png,
        # scrappy.py:519-526; the engine exports the word,weight table the
        # image is a view of — renderable anywhere, no matplotlib needed)
        from .ml.taxonomy import wordcloud_weights

        # one aggregation feeds both artifacts (CSV + PNG) — building
        # the frame twice would re-run the c-TF-IDF explode+groupBy and
        # the taxonomy transform beneath it for each action
        weights = wordcloud_weights(out).localCheckpoint(eager=False)
        weights_out = os.path.splitext(args.output)[0] + "_word_weights.csv"
        (
            weights
            .orderBy(F.desc("weight"), F.asc("word"))
            .coalesce(1)
            .write.mode("overwrite")
            .option("header", True)
            .csv(weights_out)
        )
        # K3 image sink (reference scrappy.py:519-526 wordcloud.png):
        # rendered with the engine's own bitmap-font + PNG encoder —
        # no imaging library required.
        from .ml.wordcloud import save_wordcloud_png

        png_out = os.path.splitext(args.output)[0] + "_wordcloud.png"
        n_words = save_wordcloud_png(weights, png_out)
        print(f"taxonomy written to {args.output}")
        print(f"word weights written to {weights_out}")
        print(f"wordcloud ({n_words} words) written to {png_out}")
        return 0

    if args.build_tree:
        seeds = _load_terms(args.terms_file)
        fetcher = (
            _payload_dir_fetcher(args.payload_dir) if args.payload_dir else _http_fetcher({})
        )
        edges = build_topic_tree(
            spark, seeds, fetcher, depth=args.depth,
            sources=[TREE_API_SOURCES[args.tree_api]],
        )
        tree = edges_to_nested(edges.collect())
        with open(args.tree_output, "w") as f:
            json.dump(tree, f, indent=1)
        print(f"tree written to {args.tree_output}")
        return 0

    p.print_help()
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
