"""Round-10 slope probe: wall time of the new operators at sf0.01 vs sf0.1
(min of 2 runs, local[8], shuffle_partitions=32). Evidence source for the
SCALE.md round-10 table."""

import sys
import time

sys.path.insert(0, "/root/repo")

from blow_spark import get_spark
from blow_spark.queries import queries

NAMES = [
    "eval_roc_auc_exact",
    "eval_ndcg_at_k",
    "eval_mrr_recall_at_k",
    "eval_confusion_prf_macro",
    "eval_brier_decomposition",
    "stats_fleiss_kappa",
    "stats_cramers_v",
    "ml_tree_split_gini",
    "ml_quantile_normalize",
    "scalar_geohash_encode",
    "join_geo_haversine_radius",
    "finance_vwap_monthly",
    "finance_bollinger_breakouts",
    "finance_capm_beta",
    "finance_herfindahl_concentration",
    "timeseries_holt_linear_dyadic",
    "graph_jaccard_neighbor_linkpred",
    "recsys_covisitation_next_item",
    "tokenizer_wordpiece_greedy",
    "multimodal_png_header_meta",
    "corpus_length_kl_by_source",
]


def main() -> None:
    spark = get_spark(
        app_name="slopes_r10", master="local[8]", shuffle_partitions=32
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
