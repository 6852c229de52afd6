"""Isolate one or more declared queries: fresh session, noop sink,
min-of-N wall time (guide §1.4). Usage:

    python tools/isolate_query.py q_dedup_corpus [q_other ...] [--n 4]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from scrappy_spark.plans import registry
from scrappy_spark.session import get_spark


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = 4
    for a in sys.argv[1:]:
        if a.startswith("--n"):
            n = int(a.split("=", 1)[1]) if "=" in a else int(sys.argv[sys.argv.index(a) + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("isolate")
    qs = registry.queries()
    for name in args:
        fn = qs[name]
        times = []
        for i in range(n):
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
        spark.sparkContext.setJobDescription(None)
        print(
            f"{name}: min={min(times):.3f} runs="
            + ",".join(f"{t:.2f}" for t in times),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
