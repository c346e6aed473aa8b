#!/usr/bin/env python
"""Capture `.explain("formatted")` output for a list of registered queries
into per-query text files (the round-11 optimization evidence trail:
plans/r11/<query>_{before,after}.txt).

Usage:
    python scripts/capture_plans.py <outdir> <suffix> [q1,q2,...]

With no query list, captures the bench HEADLINE + TAIL + HEADLINE_V2 sets.
Eager queries execute their build jobs during capture (unavoidable — the
plan of the returned frame is what the bench's noop sink forces).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_digit_recognition_spark.all_queries import SPARK_QUERIES  # noqa: E402
from hadoop_digit_recognition_spark.session import get_spark  # noqa: E402


def main() -> None:
    outdir = sys.argv[1]
    suffix = sys.argv[2]
    if len(sys.argv) > 3:
        names = sys.argv[3].split(",")
    else:
        import bench
        names = list(dict.fromkeys(bench.HEADLINE + bench.TAIL
                                   + bench.HEADLINE_V2))
    unknown = [n for n in names if n not in SPARK_QUERIES]
    assert not unknown, f"unknown queries: {unknown}"
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("hdr-capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    from hadoop_digit_recognition_spark.operators.dedup import (
        clear_signature_cache,
    )

    for name in names:
        clear_signature_cache(spark)
        spark.sparkContext.setJobDescription(f"plan-capture: {name}")
        try:
            df = SPARK_QUERIES[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as e:  # keep going; record the failure
            text = f"CAPTURE FAILED: {e!r}\n"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(text)
        print(f"captured {name} ({len(text)} chars)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
