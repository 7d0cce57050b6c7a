"""Round-14 CONTINUATION slope measurement: every continuation-batch operator at sf0.01 vs
sf0.1 (the SCALE.md per-round discipline — one row per new query, wall
ratio against the 10x input).

Methodology matches bench.py: noop-sink materialization, min-of-2 with
the >3x outlier tiebreak, cache cleared between runs.
Run: python scripts/scale_r14b.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

R14_QUERIES = [
    "stats_levene_brown_forsythe",
    "timeseries_yule_walker_ar2",
    "timeseries_page_hinkley",
    "timeseries_haar_wavelet_energy",
    "events_frequent_subsequences",
    "eval_best_f1_threshold",
    "ops_ivm_join_delta",
    "er_soundex_blocking",
    "timeseries_kalman_filter_1d",
    "stats_theil_sen_slope",
    "timeseries_lttb_downsample",
    "multimodal_dtmf_tone_detect",
    "graph_seeded_random_walks",
    "text_chi2_feature_selection",
]


def main() -> None:
    from blow_spark import get_spark
    from blow_spark.queries import queries

    import bench

    spark = get_spark(app_name="scale_r14b", master="local[32]")
    catalog = queries()
    results: dict[str, dict] = {}
    catalog["flagship_fizzbuzz_agg"](spark, "/root/testdata/sf0.01").write.mode(
        "overwrite"
    ).format("noop").save()
    for name in R14_QUERIES:
        row: dict = {}
        for sf_dir, key in (
            ("/root/testdata/sf0.01", "sf0.01"),
            ("/root/testdata/sf0.1", "sf0.1"),
        ):

            def run_once(name=name, sf_dir=sf_dir):
                t0 = time.perf_counter()
                catalog[name](spark, sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
                el = time.perf_counter() - t0
                spark.catalog.clearCache()
                return el

            best, samples = bench.sample_query(run_once)
            row[key] = round(best, 3)
            row[f"{key}_samples"] = [round(s, 3) for s in samples]
        row["slope"] = round(row["sf0.1"] / row["sf0.01"], 2)
        results[name] = row
        print(name, row, flush=True)
    print(json.dumps(results, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
