"""Per-query perf probe for optimization rounds.

Times selected ``queries()`` entries at a given fixture dir with the
noop sink (median of N reps, same methodology as bench.py) and/or
dumps ``.explain("formatted")`` to plans/<tag>/<query>_<suffix>.txt.

Usage:
    python tools/perf_probe.py [--sf DIR] [--reps N] [--explain TAG:SUFFIX]
                               [--warm] query [query ...]

  --sf DIR       fixture dir (default /root/testdata/sf0.1)
  --reps N       timing reps (default 3; 0 = skip timing)
  --explain T:S  write plans/<T>/<query>_<S>.txt explain output
  --warm         run bench.py's session warmups first (JVM + Arrow)

Prints one JSON line: {"query": {"med": s, "reps": [..]}, ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from safedata_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    reps = 3
    explain_spec = None
    warm = False
    names = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--sf":
            sf_dir = args[i + 1]
            i += 2
        elif a == "--reps":
            reps = int(args[i + 1])
            i += 2
        elif a == "--explain":
            explain_spec = args[i + 1]
            i += 2
        elif a == "--warm":
            warm = True
            i += 1
        else:
            names.append(a)
            i += 1

    spark = get_spark("safedata-perf-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    unknown = [n for n in names if n not in qs]
    assert not unknown, f"unknown queries: {unknown}"

    if warm:
        from pyspark.sql import functions as F

        qs["value_counts"](spark, sf_dir).collect()

        def _arrow_warm(it):
            import numpy  # noqa: F401

            from safedata_pipeline_spark.operators import jpeg_codec  # noqa: F401

            for pdf in it:
                yield pdf

        spark.range(0, 32, 1, 32).mapInPandas(_arrow_warm, "id long").write.format(
            "noop"
        ).mode("overwrite").save()
        warm_dir = "/root/testdata/sf0.001"
        for n in names:
            try:
                qs[n](spark, warm_dir).write.format("noop").mode("overwrite").save()
            except Exception:
                pass

    out = {}
    for n in names:
        samples = []
        for _ in range(max(reps, 0)):
            import gc

            gc.collect()
            spark.sparkContext.setJobDescription(f"probe:{n}")
            t0 = time.time()
            qs[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        if explain_spec:
            if ":" not in explain_spec:
                raise SystemExit(
                    f"--explain expects TAG:SUFFIX, got {explain_spec!r}"
                )
            tag, suffix = explain_spec.split(":", 1)
            pdir = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "plans",
                tag,
            )
            os.makedirs(pdir, exist_ok=True)
            plan = qs[n](spark, sf_dir)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(os.path.join(pdir, f"{n}_{suffix}.txt"), "w") as f:
                f.write(plan)
        if samples:
            out[n] = {"med": sorted(samples)[len(samples) // 2], "reps": samples}
        else:
            out[n] = {"med": None, "reps": []}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
