#!/usr/bin/env python
"""Round-14 scale re-pin (r13 verdict #6): the kernels whose code
changed in r13/r14 get fresh 1x vs 10x probe rows so the at-scale
exponent claims rest on the CURRENT code:

- dedup_minhash_lsh  (r13 affine hoist + r14 expression memo)
- ann_ivf_topk       (r13 natural partitioning + r14 spread guard)
- tumbling_window_approx (r13 datasketches split, r14 lgConfigK=14)
- text_repetition_stats  (r14 sorted-run kernel + spread + barrier)

Scaled input = tools/make_scaled_sf.py K=10 (consistent id shifts, so
join selectivity and dedup structure replicate linearly). Timing: noop
sink, warm JVM, one untimed warmup then best-of-3 per point. The
e-exponent is log10(t10/t1): e≈1 linear, e<1 floor amortizing.

Usage: python tools/scale_probe_r14.py SCALED_DIR [BASE_DIR]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from uquery_rs_spark import queries as Q
from uquery_rs_spark.session import get_spark

Q.load_all()

NAMES = [
    "dedup_minhash_lsh",
    "ann_ivf_topk",
    "tumbling_window_approx",
    "text_repetition_stats",
]


def best_of(run, n=3) -> float:
    run()
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    return min(times)


def main() -> None:
    scaled = sys.argv[1]
    base = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("scale-probe-r14")
    rows = {}
    for sf_dir in (base, scaled):
        Q.REGISTRY[NAMES[0]].spark_fn(spark, sf_dir).count()  # warm footers
        for name in NAMES:
            q = Q.REGISTRY[name]
            fn = q.bench_fn or q.spark_fn
            spark.sparkContext.setJobDescription(f"probe:{name}@{sf_dir}")
            t = best_of(
                lambda: fn(spark, sf_dir)
                .write.format("noop")
                .mode("overwrite")
                .save()
            )
            rows.setdefault(name, {})[sf_dir] = t
            print(f"  {name} @ {sf_dir}: {t:.3f}s", flush=True)
    import math

    print("\n| kernel | 1x s | 10x s | ratio | e |")
    print("|---|---|---|---|---|")
    for name in NAMES:
        t1, t10 = rows[name][base], rows[name][scaled]
        r = t10 / t1
        print(f"| {name} | {t1:.2f} | {t10:.2f} | {r:.1f}x | {math.log10(r):.2f} |")


if __name__ == "__main__":
    main()
