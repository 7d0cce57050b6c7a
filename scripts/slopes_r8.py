"""Round-8 slope probe: wall time of the new operators at sf0.01 vs sf0.1
(min of 2 runs, local[8], shuffle_partitions=32). Evidence source for the
SCALE.md round-7 table."""

import time

from blow_spark import get_spark
from blow_spark.queries import queries

NAMES = [
    "similarity_maxsim_multivector",
    "stats_ks_two_sample",
    "stats_spearman_rank_corr",
    "events_concurrency_peak",
    "events_stickiness_dau_wau",
    "events_rolling_retention_d1_d7",
    "text_rake_keywords",
    "text_unicode_nfc_normalize",
    "graph_hits_hubs_authorities",
    "stats_ols_two_feature",
    "orders_cohort_ltv",
    "orders_interpurchase_percentiles",
    "finance_max_drawdown",
    "timeseries_cross_correlation",
    "timeseries_theil_sen_trend",
    "timeseries_mann_kendall_trend",
    "timeseries_burst_detection_kleinberg",
    "sample_priority_weighted",
    "vector_gram_matrix_pandas",
    "multimodal_image_ahash_dedup",
    "privacy_t_closeness",
    "privacy_k_anonymize_generalize",
    "window_rolling_median_exact",
    "sql_distinct_on_emulation",
    "agg_hll_intersection_gate",
    "join_asof_topk",
]


def main() -> None:
    spark = get_spark(
        app_name="slopes_r8", master="local[8]", shuffle_partitions=32
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
