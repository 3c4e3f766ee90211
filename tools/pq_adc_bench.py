#!/usr/bin/env python
"""Microbench: PQ ADC candidate scoring — per-query LUT vs literal
reconstruction (VERDICT r4 #7).

Same codebooks, same codes, same output (asserted); only the scoring
expression differs:

* recon: each candidate pays m·d_sub multiplies to rebuild the vector
  plus a d_sub-long cosine fold against the query;
* LUT: the m×n_codes dot table is computed once per query on the
  broadcast side; each candidate pays m element_at adds (numerator)
  + m element_at adds (reconstruction norm) — independent of d_sub.

Prints ONE JSON line. Run: python tools/pq_adc_bench.py
Env: PQ_BENCH_N (corpus vectors, default 200000), PQ_BENCH_Q (queries,
default 32), PQ_BENCH_DIM (default 64), PQ_BENCH_M (default 4).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from pyspark.sql import functions as F

    from clinvar_ingest_spark import get_spark
    from clinvar_ingest_spark.operators.ann import pq_topk

    n = int(os.environ.get("PQ_BENCH_N", "200000"))
    nq = int(os.environ.get("PQ_BENCH_Q", "32"))
    dim = int(os.environ.get("PQ_BENCH_DIM", "64"))
    m = int(os.environ.get("PQ_BENCH_M", "4"))
    spark = get_spark(
        "pq-adc-bench", master="local[8]", shuffle_partitions=16,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    # deterministic synthetic corpus: dims from a hash mix of (id, j)
    corpus = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: (
                F.pmod(F.xxhash64(F.col("id"), j), F.lit(1000)).cast("double")
                / 500.0
                - 1.0
            ),
        ).alias("embedding"),
    ).persist()
    corpus.count()
    queries = corpus.filter(F.col("vec_id") < nq)

    out = {"n": n, "n_queries": nq, "dim": dim, "m": m, "d_sub": dim // m}
    results = {}
    for mode, lut in (("recon", False), ("lut", True)):
        # warmup (train/encode identical in both; timing captures the
        # whole job — the scoring stage is the only differing part)
        pq_topk(corpus, queries, dim=dim, m=m, use_lut=lut).count()
        best = None
        for _ in range(3):
            t0 = time.monotonic()
            rows = pq_topk(corpus, queries, dim=dim, m=m, use_lut=lut).collect()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        results[mode] = {"sec": round(best, 3)}
        out[f"rows_{mode}"] = sorted(tuple(r) for r in rows)
    assert out.pop("rows_recon") == out.pop("rows_lut"), "outputs differ"
    out["recon_sec"] = results["recon"]["sec"]
    out["lut_sec"] = results["lut"]["sec"]
    out["speedup"] = round(results["recon"]["sec"] / results["lut"]["sec"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
