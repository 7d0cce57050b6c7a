"""Round-12 slope measurement: every round-12 operator at sf0.01 vs
sf0.1 (the SCALE.md per-round discipline — one row per new query, wall
ratio against the 10x input), plus the forced-distributed CC re-measure
that scripts/scale_graph.py runs separately.

Methodology matches bench.py: noop-sink materialization, min-of-2 with
the round-12 outlier tiebreak (third sample when the two disagree >3x),
cache cleared between runs.

Run: python scripts/scale_r12.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

R12_QUERIES = [
    "multimodal_jpeg_420_decode_stats",
    "spatial_dbscan_clusters",
    "multimodal_qoi_decode_stats",
    "agg_ams_f2_moment_sketch",
    "dedup_ppjoin_positional",
    "corpus_good_turing_counts",
    "multimodal_mp4_box_walk",
    "privacy_dp_median_exponential",
    "stats_ljung_box_whiteness",
    "dedup_simhash_hamming_paired",
    "vector_hadamard_rotation_parseval",
    "stats_gumbel_block_maxima",
    "finance_var_cvar_historical",
    "ml_isotonic_calibration_pav",
    "ml_conformal_split_interval",
    "multimodal_png_adam7_decode",
    "privacy_dp_histogram_gaussian",
    "ml_target_encoding_loo",
]


def main() -> None:
    from blow_spark import get_spark
    from blow_spark.queries import queries

    import bench

    spark = get_spark(app_name="scale_r12", master="local[32]")
    catalog = queries()
    results: dict[str, dict] = {}
    # warm codegen once
    catalog["flagship_fizzbuzz_agg"](spark, "/root/testdata/sf0.01").write.mode(
        "overwrite"
    ).format("noop").save()
    for name in R12_QUERIES:
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
