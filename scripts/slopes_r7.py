"""Round-7 slope probe: wall time of the new operators at sf0.01 vs sf0.1
(min of 2 runs, local[8], shuffle_partitions=32). Evidence source for the
SCALE.md round-7 table."""

import time

from blow_spark import get_spark
from blow_spark.queries import queries

NAMES = [
    "text_ngram_novelty",
    "text_bigram_kneser_ney",
    "text_watermark_greenlist",
    "graph_common_neighbors_linkpred",
    "graph_adamic_adar_linkpred",
    "events_mau_bitmap_rolling",
    "vector_pq_quantize",
    "join_asof_nearest",
    "timeseries_m4_downsample",
    "events_kaplan_meier_retention",
    "join_bloom_semi_reduction",
    "corpus_zipf_exponent",
    "events_time_to_convert",
    "orders_abc_pareto",
    "similarity_dim_truncation_recall",
    "basket_association_rules",
    "dedup_minhash_estimate_error",
    "events_cohort_retention_weekly",
]


def main() -> None:
    spark = get_spark(
        app_name="slopes_r7", master="local[8]", shuffle_partitions=32
    )
    qs = queries()
    out: dict[str, dict[str, float]] = {}
    for sf in ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]:
        for n in NAMES:
            best = None
            for _ in range(2):
                t0 = time.time()
                qs[n](spark, sf).collect()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            key = sf.rsplit("/", 1)[-1]
            out.setdefault(n, {})[key] = round(best, 3)
            print(f"{key} {n} {best:.3f}", flush=True)
    print("---- summary ----", flush=True)
    for n, d in out.items():
        s01, s1 = d.get("sf0.01"), d.get("sf0.1")
        print(
            f"{n:40s} sf0.01={s01:7.3f}  sf0.1={s1:7.3f}  slope={s1 / s01:5.2f}x",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
