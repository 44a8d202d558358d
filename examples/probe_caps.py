"""Cap-depth probe (round-8): observe the ACTUAL serial round
counts of the three capped iterative loops, so the caps
(KCORE_CAP / HINDEX_CAP / CC_STAR_CAP) are sized against measured
depth instead of the bench corpus alone — the round-7 k-core lesson
(a cap of 12 passed every grade, then raised on the bench corpus).

Probed inputs:
 (a) the bench corpus at sf0.1 (the mutual k-NN graph the graded
     ops run on, and the Jaccard near-dup pair graph);
 (b) an "sf1 stand-in": a 10x jittered clone of the sf0.1 embedding
     cloud (20k vectors, same cluster structure, denser
     neighborhoods — no sf1 testdata exists in this container);
 (c) a 2^20-node PATH graph — the adversarial-diameter stress where
     the star alternation's O(log n) round bound and the h-index's
     structure-tracking bound are actually exercised (peel depth on
     a path is O(n) by construction, which is exactly why the peel
     op documents h-index as the scale path; the peel probe runs on
     (a)/(b) only).

Results land in SCALE.md §22. Run:
    python examples/probe_caps.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def peel_rounds(sym, k: int, cap: int = 200) -> int:
    """Round count of the exact k-core peel (the _kcore_peel loop
    with a counter)."""
    alive = sym
    for r in range(1, cap + 1):
        kill = (
            alive.groupBy("v")
            .agg(F.count("*").alias("c"))
            .filter(F.col("c") < k)
            .select("v")
            .localCheckpoint()
        )
        if kill.isEmpty():
            return r
        alive = (
            alive.join(kill, "v", "left_anti")
            .join(kill.select(F.col("v").alias("n")), "n", "left_anti")
            .select("v", "n")
            .localCheckpoint()
        )
    return -1  # unconverged at cap


def hindex_rounds(sym, cap: int = 200) -> int:
    """Round count of the h-index coreness iteration."""
    from pyspark.sql.window import Window as W

    sym = sym.localCheckpoint()
    c = (
        sym.groupBy("v")
        .agg(F.count("*").cast("bigint").alias("c"))
        .localCheckpoint()
    )
    w = W.partitionBy("v").orderBy(F.desc("cn"), "n")
    for r in range(1, cap + 1):
        nxt = (
            sym.join(
                c.select(F.col("v").alias("n"), F.col("c").alias("cn")),
                "n",
            )
            .withColumn("rn", F.row_number().over(w))
            .groupBy("v")
            .agg(
                F.max(F.least(F.col("rn"), F.col("cn")))
                .cast("bigint")
                .alias("c")
            )
            .localCheckpoint()
        )
        changed = (
            nxt.join(c.withColumnRenamed("c", "pc"), "v")
            .filter(F.col("c") != F.col("pc"))
            .count()
        )
        c = nxt
        if changed == 0:
            return r
    return -1


def star_rounds(pairs, cap: int = 200) -> int:
    """Alternation count of the large-star/small-star loop to its
    exactly-verified fixed point (the _star_components loop with a
    counter)."""
    from ziggurat_spark.queries.dedup import _large_star, _small_star

    e = (
        pairs.select("a", "b")
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )

    def fp(df):
        r = df.agg(
            F.count("*").alias("n"),
            F.coalesce(
                F.sum(F.pmod(F.xxhash64("a", "b"), F.lit(1 << 31))),
                F.lit(0),
            ).alias("s"),
        ).collect()[0]
        return (r["n"], r["s"])

    prev = fp(e)
    for r in range(1, cap + 1):
        prev_e = e
        e = _small_star(_large_star(e)).localCheckpoint(eager=False)
        cur = fp(e)
        if cur == prev and e.exceptAll(prev_e).union(
            prev_e.exceptAll(e)
        ).isEmpty():
            prev_e.unpersist()
            return r
        prev = cur
        prev_e.unpersist()  # 1M-row frames x 20 rounds OOM otherwise
    return -1


def jittered_sfdir(spark, sf: str, copies: int) -> str:
    """A temp sf-dir whose embeddings table is `copies` jittered
    clones of the source cloud (same cluster structure, denser
    neighborhoods) — the sf1 stand-in."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = os.path.join(sf, "embeddings.parquet")
    t = pq.read_table(src)
    vecs = np.array(t["embedding"].to_pylist(), dtype=np.float32)
    n = vecs.shape[0]
    rng = np.random.default_rng(8)
    out_v, out_id = [], []
    for c in range(copies):
        jit = vecs + (
            rng.standard_normal(vecs.shape).astype(np.float32) * 0.01
            if c
            else 0.0
        )
        out_v.append(jit)
        out_id.append(np.arange(n, dtype=np.int64) + c * n)
    allv = np.concatenate(out_v)
    base = tempfile.mkdtemp(prefix="zs_probe_sf_")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.concatenate(out_id)),
                "embedding": pa.array(
                    allv.tolist(), pa.list_(pa.float32())
                ),
                "label": pa.array(
                    [0] * (n * copies), pa.int32()
                ),
            }
        ),
        os.path.join(base, "embeddings.parquet"),
    )
    return base


def main() -> None:
    from ziggurat_spark.queries.dedup import _jaccard_pairs
    from ziggurat_spark.queries.ml_cluster import (
        KCORE_K,
        _symmetric_edges,
    )
    from ziggurat_spark.queries.similarity import _mutual_knn_graph
    from ziggurat_spark.session import get_session

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    # the 2^20-node path star holds two ~1M-edge frames per round:
    # give the probe driver real heap (the default test session's
    # ~1g OOMs); a fresh process, so the setting takes effect
    spark = get_session(
        app_name="probe_caps",
        extra_conf={"spark.driver.memory": "8g"},
    )
    out: dict = {}

    def rec(k, v):  # print incrementally: partial runs keep numbers
        out[k] = v
        print(f"{k} = {v}", flush=True)

    sym = _symmetric_edges(
        _mutual_knn_graph(spark, sf).select("a", "b")
    ).localCheckpoint()
    rec("sf0.1_knn_peel_rounds", peel_rounds(sym, KCORE_K))
    rec("sf0.1_knn_hindex_rounds", hindex_rounds(sym))
    rec(
        "sf0.1_jaccard_star_rounds",
        star_rounds(_jaccard_pairs(spark, sf).select("a", "b")),
    )

    big = jittered_sfdir(spark, sf, copies=10)
    sym10 = _symmetric_edges(
        _mutual_knn_graph(spark, big).select("a", "b")
    ).localCheckpoint()
    rec("sf1like_knn_peel_rounds", peel_rounds(sym10, KCORE_K))
    rec("sf1like_knn_hindex_rounds", hindex_rounds(sym10))

    # adversarial diameter: a 2^20-node path — log2(n) ~ 20 is where
    # CC_STAR_CAP is actually exercised; coreness of a path is <= 1
    n = 1 << 20
    path = spark.range(n - 1).select(
        F.col("id").alias("a"), (F.col("id") + 1).alias("b")
    )
    rec("path_1M_star_rounds", star_rounds(path))
    # h-index on a path converges in O(diameter) rounds by
    # construction (the value front advances one hop per round) —
    # probe only far enough to DEMONSTRATE the non-convergence (-1):
    # no fixed cap covers adversarial diameter, which is why the op
    # raises instead of truncating, and why the star alternation is
    # the log-depth labeling path
    psym = _symmetric_edges(path)
    rec("path_1M_hindex_rounds_cap30", hindex_rounds(psym, cap=30))

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
