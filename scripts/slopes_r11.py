"""Round-11 slope probe: wall time at sf0.01 vs sf0.1 (min of 2 runs,
local[8], shuffle_partitions=32) for (a) the four round-10 operators
that landed after the round-10 slope run (round-10 verdict item #2:
the repo's evidence policy requires a slope row for every operator),
and (b) every round-11 addition. Evidence source for the SCALE.md
round-11 table."""

import sys
import time

sys.path.insert(0, "/root/repo")

from blow_spark import get_spark
from blow_spark.queries import queries

NAMES = [
    # round-10 stragglers (landed after scripts/slopes_r10.py ran)
    "events_path_entropy",
    "privacy_geohash_coarsen",
    "ml_feature_hashing_counts",
    "ml_learning_curve_auc",
    # round-11 batch 1
    "dedup_exact_substring",
    "multimodal_jpeg_decode_stats",
    "similarity_ann_method_report",
    # round-11 batch 2: codec shelf
    "multimodal_g711_decode_energy",
    "multimodal_adpcm_decode_energy",
    "multimodal_mp3_frame_header",
    "multimodal_gif_header_meta",
    "multimodal_bmp_decode_stats",
    # analytics shelf
    "eval_average_precision",
    "eval_matthews_corrcoef",
    "stats_gini_coefficient",
    "stats_wilcoxon_signed_rank",
    "ml_pca_two_feature",
    "timeseries_dtw_band_distance",
    "graph_closeness_centrality_bfs",
    "graph_modularity_score",
    "finance_sharpe_sortino",
    "text_aho_corasick_blocklist",
    "text_winnowing_fingerprint",
    "sql_qualify_front_door",
]


def main() -> None:
    spark = get_spark(
        app_name="slopes_r11", master="local[8]", shuffle_partitions=32
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


if __name__ == "__main__":
    main()
