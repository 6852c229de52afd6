"""Capture .explain("formatted") for headline queries into plans/r14/.

Usage: python tools/capture_plans.py <suffix> [query ...]
e.g.  python tools/capture_plans.py before            # all headline
      python tools/capture_plans.py after q_lang_id_scored
"""

from __future__ import annotations

import io
import os
import sys
import contextlib

sys.path.insert(0, "/root/repo")

from scrappy_spark.session import get_spark  # noqa: E402


def main() -> int:
    suffix = sys.argv[1]
    only = sys.argv[2:]
    import bench

    names = only or bench.HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("capture_plans")
    from scrappy_spark.plans import registry

    qs = registry.queries()
    out_dir = "/root/repo/plans/r14"
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # capture the failure, keep going
            text = f"EXPLAIN FAILED: {exc}\n"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(text)
        print(f"captured {name}_{suffix} ({len(text)} bytes)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
