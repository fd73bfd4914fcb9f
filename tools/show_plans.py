"""Dump .explain("formatted") for the headline queries → BENCH/PLANS.md.

The plan-review loop the engine was tuned with: verify scans are pruned
(ReadSchema minimal, PushedFilters present), joins broadcast when a side is
small, aggregations partial+final, and Arrow kernel stages sit in a single
pipelined stage with no extra shuffle.

Usage: python tools/show_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HEADLINE = [
    "tile_counts_z13",
    "pip_inner",
    "way_nodes_resolution",
    "q1_pricing_summary",
    "image_geo_tiles",
    "osc_apply_events",
    "boundary_tile_cover_z10",
    "image_stats",
    "image_phash_neardup",
    "image_roundtrip_fidelity",
    "embedding_topk_blocked",
    "dedup_jaccard_ngram",
    "h3_compact_roundtrip",
    "video_frame_luma",
    "zonal_stats_z10",
    "nearest_boundary_vertex",
    "hilbert_key_z12",
    "stratified_sample_z6",
    "hotspot_days_z5",
    "hamming_neardup_pairs",
    "convex_hull_groups",
    "hilbert_range_scan_z12",
    "embedding_pq_ann",
    "profile_documents",
    "compaction_plan_docs",
    "geo_phash_neardup_z7",
    "viterbi_match_tracks",
    "hausdorff_pairs_tracks",
    "auc_lang_by_source",
    "image_rle_runs",
    "kcore20_planted",
    "geofence_scrub_points",
    "mad_nchars_by_source",
    # session-14 family heads
    "ripley_k_pairs",
    "knox_space_time",
    "tile_kendall_tau_z5",
    "tile_isotonic_z5",
    "ks_source_drift",
    "tile_dispersion_z6",
    "terrain_viewshed_z10_7",
    "hits_user_types",
    "rank_agg_types_z5",
    "dedup_lcs_pairs",
    "soundex_name_pairs",
    "boundary_image_luma",
    # session-15 family heads
    "road_link_prediction",
    "cell_msf_z5",
    "covisit_ktruss_4",
    "image_brief_match",
    "terrain_d8_flow_z10_7",
    "local_moran_z8",
    "geofence_dwell",
    "tile_ewma_z5",
    "track_sinuosity",
    "textrank_keywords",
    "terrain_watershed_z10_7",
    "terrain_flow_accumulation_z10_7",
    "ppr_roads",
    "bivariate_moran_z8",
    "ivm_join_delta",
    "embedding_matryoshka_overlap",
    "attribution_last_touch",
    "basket_lift_pairs",
    # round-4 heads
    "h3_polyfill_r4",
    "image_stats_phash_formula",
    "edge_negative_samples",
    "kmeans_exact_k6_r3",
]

KEEP = (
    "Scan parquet",
    "ReadSchema",
    "PushedFilters",
    "Join",
    "Exchange",
    "WholeStageCodegen",
    "ArrowEvalPython",
    "MapInArrow",
    "PythonMapInArrow",
    "HashAggregate",
    "Window",
    "Generate",
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from osmgraft.queries import REGISTRY
    from osmgraft.session import get_spark

    spark = get_spark("plans", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

    out = ["# BENCH/PLANS.md — physical plans of the headline queries\n"]
    out.append(
        "Condensed `.explain('formatted')` (scans/joins/exchanges/codegen/Arrow "
        f"stages) at {sf_dir}. Full plans: re-run `python tools/show_plans.py`.\n"
    )
    for name in HEADLINE:
        if name not in REGISTRY:
            continue
        df = REGISTRY[name][0](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(mode)
        lines = [
            ln for ln in plan.splitlines() if any(k in ln for k in KEEP)
        ]
        out.append(f"## {name}\n\n```\n" + "\n".join(lines) + "\n```\n")
    path = os.path.join(REPO, "BENCH", "PLANS.md")
    with open(path, "w") as fh:
        fh.write("\n".join(out))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
