"""Runnable end-to-end demo: the LLM training-data pipeline on the
engine's graded operators (SURVEY §7 north star).

One script walks a document corpus through the stages a pretraining
data pipeline actually runs, each powered by a query from the
oracle-checked surface:

  1. curate   — tokenize → language/quality gate → content-hash
                dedup → deterministic train/valid/test split
                (x_corpus_pipeline)
  2. near-dup — MinHash-LSH candidates + exact n-gram Jaccard verify
                (x_minhash_lsh_pairs / x_ngram_jaccard_pairs)
  3. cluster  — exact-integer k-means over the embeddings
                (x_kmeans_exact)
  4. search   — cosine top-k neighbors, IVF cell-pruned
                (x_ivf_ann_topk)

Run:  python examples/llm_pipeline.py  [sf_dir]

Every stage is partition-parallel (see SCALE.md §6-7, §10f-g); the
same calls run unchanged on a cluster against object-store parquet.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from ziggurat_spark.queries import all_queries  # noqa: E402
from ziggurat_spark.session import get_session  # noqa: E402


def main(sf_dir: str) -> None:
    spark = get_session(app_name="llm_pipeline_example")
    q = all_queries()

    print(f"== corpus curation (sf_dir={sf_dir}) ==")
    curated = q["x_corpus_pipeline"].spark(spark, sf_dir)
    curated.show(20, truncate=False)

    print("== near-duplicate pairs (LSH candidates -> exact Jaccard) ==")
    cands = q["x_minhash_lsh_pairs"].spark(spark, sf_dir)
    verified = q["x_ngram_jaccard_pairs"].spark(spark, sf_dir)
    print(f"LSH candidate pairs: {cands.count()}")
    verified.show(10, truncate=False)

    print("== embedding clusters (2 exact Lloyd iterations, k=4) ==")
    q["x_kmeans_exact"].spark(spark, sf_dir).show(truncate=False)

    print("== IVF ANN: top-5 neighbors per query vector ==")
    q["x_ivf_ann_topk"].spark(spark, sf_dir).show(25, truncate=False)

    print("== IVF x SQ8: cell-pruned int8 ANN (the production stack) ==")
    q["x_ivf_sq8_topk"].spark(spark, sf_dir).show(10, truncate=False)

    print("== benchmark decontamination (bloom pre-gate funnel) ==")
    q["x_bloom_prefilter"].spark(spark, sf_dir).show(truncate=False)
    q["x_decontaminate_overlap"].spark(spark, sf_dir).show(5, truncate=False)

    print("== quality gates (Gopher repetition / OOV) ==")
    q["x_repetition_filter"].spark(spark, sf_dir).show(5, truncate=False)

    print("== sequence packing + mixture weights ==")
    q["x_sequence_packing"].spark(spark, sf_dir).show(10, truncate=False)
    q["x_sampling_mix_weights"].spark(spark, sf_dir).show(truncate=False)

    print("== the whole curation path, end-to-end (v2 flagship) ==")
    q["x_corpus_pipeline_v2"].spark(spark, sf_dir).show(truncate=False)

    print("== selection -> curriculum -> packing (v5 flagship) ==")
    q["x_corpus_pipeline_v5"].spark(spark, sf_dir).show(20, truncate=False)

    print("== the same selection corpus, maintained from a STREAM ==")
    q["x_stream_select_corpus"].spark(spark, sf_dir).show(truncate=False)

    print("== multimodal near-dup over binary assets ==")
    q["x_multimodal_neardup"].spark(spark, sf_dir).show(10, truncate=False)

    print("== IVF drift repair: moved cells + what the retrain bought ==")
    q["x_ivf_retrain"].spark(spark, sf_dir).show(10, truncate=False)

    print("== keep/drop kept current ONLINE (incremental star forest) ==")
    q["x_stream_components_maintain"].spark(spark, sf_dir).show(
        10, truncate=False
    )

    print("== multimodal near-dup detected live from the asset stream ==")
    q["x_stream_multimodal_neardup"].spark(spark, sf_dir).show(
        10, truncate=False
    )

    print("== the live ANN index, Lloyd-repaired on cadence ==")
    q["x_stream_ivf_cadence"].spark(spark, sf_dir).show(
        10, truncate=False
    )

    print("== monthly snapshot update: what changed, what re-enters ==")
    q["x_corpus_snapshot_diff"].spark(spark, sf_dir).show(
        20, truncate=False
    )
    print("== ...and ONLY the delta re-enters near-dup (O(delta)) ==")
    q["x_incremental_neardup"].spark(spark, sf_dir).show(
        10, truncate=False
    )

    print("== corpus telemetry via mergeable sketches ==")
    q["x_stream_hll_maintain"].spark(spark, sf_dir).show(truncate=False)
    q["x_loghist_quantiles"].spark(spark, sf_dir).show(truncate=False)
    q["x_heavy_hitters_cms"].spark(spark, sf_dir).show(truncate=False)
    q["x_stream_cms_maintain"].spark(spark, sf_dir).show(truncate=False)

    print("== graph-density screen before community detection ==")
    q["x_kcore_decompose"].spark(spark, sf_dir).show(10, truncate=False)
    q["x_coreness_hindex"].spark(spark, sf_dir).show(10, truncate=False)

    print("== the refresh: text work O(delta), verdicts carried ==")
    q["x_corpus_refresh_incremental"].spark(spark, sf_dir).show(
        truncate=False
    )
    print("== the v2 dump applied as a stream (bucketed LWW state) ==")
    q["x_stream_snapshot_apply"].spark(spark, sf_dir).show(
        10, truncate=False
    )
    print("== weighted sampling, one-shot and maintained ==")
    q["x_weighted_sample_bottomk"].spark(spark, sf_dir).show(
        10, truncate=False
    )
    q["x_stream_weighted_sample"].spark(spark, sf_dir).show(
        10, truncate=False
    )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
