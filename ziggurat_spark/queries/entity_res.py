"""Entity resolution (record linkage) over a deterministic dirty
registry derived from ``customer`` — the remaining classic
training-data-curation op the surface lacked: resolving multiple
dirty spellings of the same real-world entity into one golden
record.

Pipeline (Hernandez & Stolfo '95 merge/purge, multi-pass sorted
neighborhood; survivorship per standard MDM practice):

1. **Dirty registry** — each customer row deterministically yields
   up to three records: the canonical spelling, a formatting variant
   (zero-padding stripped: ``Customer#000000042 -> Customer#42``),
   and a typo variant (5th-from-last character dropped), with small
   deterministic balance jitter. Everything derives from the input
   table, so the ground truth (``ck``) is known and precision /
   recall are exactly gradable.
2. **Multi-pass sorted-neighborhood blocking** — pass 1 sorts by
   (numeric digits, normalized name), pass 2 by (segment, balance);
   each record pairs with its next ``SNM_WINDOW`` neighbors in each
   sort order. O(n * w) candidates, never O(n^2), and no fixed-
   cardinality block key that would stop scaling.
3. **Verify** — char-trigram Jaccard >= 0.30 on the normalized
   name AND edit distance <= 1 between zero-trimmed digit strings
   (the discriminative key region — trigram overlap alone cannot
   separate zero-padded serial names) AND same market segment AND
   |balance delta| <= 150.
4. **Cluster** — connected components (min-label propagation, same
   shape as x_dedup_components) over verified match pairs: CC is
   what makes "A matches B, B matches C" one entity.
5. **Survivorship** — per cluster the golden record is the max
   (balance, rec_id) member; funnel counts (candidates, verified,
   true-positive, ground-truth pairs) and integer precision/recall
   percentages ride every row as constants, scalar-subquery style.

Scale shape (100 TB): the sorted neighborhood is implemented
WITHOUT a global single-partition window — records are
range-partitioned on the sort key, each partition's first w rows
are replicated to the preceding partition, and the sliding pairs
come from a window PARTITIONED by range-partition id. Pair set is
identical to the global-order spelling whenever every range
partition holds >= w rows (the partition count is derived from the
registry size to guarantee ~64+ rows per partition), and the DuckDB
oracle grades exactly that equivalence. Candidate fan-out is
bounded by w per pass; the verify join touches candidates only;
CC is the bounded-round min-label loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ziggurat_spark.queries.registry import register
from ziggurat_spark.scratch import release_checkpoint
from ziggurat_spark.tables import load_table

#: sorted-neighborhood window (pairs per record per pass)
SNM_WINDOW = 4

#: verify thresholds: trigram Jaccard on the normalized name, the
#: balance tolerance the deterministic jitter stays within, and the
#: max edit distance between zero-trimmed digit strings (every true
#: variant is <= 1 by construction: zero-strip changes nothing,
#: the typo drops exactly one character)
ER_JACCARD_MIN = 0.30
ER_BAL_TOL = 150
ER_DIGIT_EDIT_MAX = 1

#: minimum rows a range partition must hold for boundary
#: replication to cover the window (partition count is derived as
#: registry_rows // (16 * SNM_WINDOW) so the average is ~64)
_ROWS_PER_PART = 16 * SNM_WINDOW


def _registry(spark: SparkSession, sf: str) -> DataFrame:
    """The deterministic dirty registry: canonical + up to two
    variants per customer, ground-truth entity key ``ck`` kept."""
    base = load_table(spark, sf, "customer").select(
        F.col("c_custkey").alias("ck"),
        F.col("c_name").alias("nm"),
        F.col("c_mktsegment").alias("seg"),
        F.col("c_acctbal").cast("double").alias("bal"),
    )
    r0 = base.select(
        (F.col("ck") * 4).alias("rec_id"),
        "ck",
        F.col("nm").alias("name"),
        "seg",
        "bal",
    )
    r1 = base.filter(F.col("ck") % 3 != 0).select(
        (F.col("ck") * 4 + 1).alias("rec_id"),
        "ck",
        F.expr("regexp_replace(nm, '#0+', '#')").alias("name"),
        "seg",
        (F.col("bal") + (F.col("ck") % 100) - 50).alias("bal"),
    )
    r2 = base.filter(F.col("ck") % 5 == 2).select(
        (F.col("ck") * 4 + 2).alias("rec_id"),
        "ck",
        F.expr(
            "concat(substr(nm, 1, length(nm) - 5),"
            " substr(nm, length(nm) - 3, 4))"
        ).alias("name"),
        "seg",
        (F.col("bal") - (F.col("ck") % 80)).alias("bal"),
    )
    return r0.unionByName(r1).unionByName(r2)


def featurize_records(reg: DataFrame) -> DataFrame:
    """Normalized name, digit keys, distinct char trigrams for any
    frame of registry-shaped records — ONE Spark spelling shared by
    the batch op and the streaming twin's per-trigger featurize."""
    return (
        reg.withColumn(
            "norm", F.expr("lower(regexp_replace(name, '[^a-zA-Z0-9]', ''))")
        )
        .withColumn(
            "dig",
            F.expr(
                "cast(nullif(regexp_replace(name, '[^0-9]', ''), '')"
                " as bigint)"
            ),
        )
        # zero-trimmed digit string: the discriminative entity key
        # region (trigram Jaccard alone cannot separate zero-padded
        # serial names — the shared prefix dominates the trigram set)
        .withColumn(
            "dstr",
            F.expr(
                "regexp_replace(regexp_replace(name, '[^0-9]', ''),"
                " '^0+', '')"
            ),
        )
        # every registry name is >= 9 chars after normalization, so
        # sequence(1, length-2) is always ascending and non-empty
        .withColumn(
            "tg",
            F.expr(
                "array_distinct(transform(sequence(1, length(norm) - 2),"
                " i -> substring(norm, i, 3)))"
            ),
        )
        .withColumn("ntg", F.size("tg"))
    )


def _featurized(spark: SparkSession, sf: str) -> DataFrame:
    """Registry + normalized name, digit key, distinct char trigrams."""
    return featurize_records(_registry(spark, sf))


def _snm_pairs(feat: DataFrame, order_cols: list, n_parts: int) -> DataFrame:
    """Sorted-neighborhood candidate pairs for ONE sort order,
    distributed: range-partition on the sort key, replicate each
    partition's first ``SNM_WINDOW`` rows to the preceding
    partition, then slide a lead-window PARTITIONED by the range id
    — no global single-partition window anywhere. Equivalent to the
    global-order pair set when every partition holds >= w rows."""
    cols = ["rec_id"] + [c for c in order_cols if c != "rec_id"]
    keyed = (
        feat.select(*cols)
        .repartitionByRange(n_parts, *order_cols)
        .withColumn("pid", F.spark_partition_id())
    )
    in_part = Window.partitionBy("pid").orderBy(*order_cols)
    head = (
        keyed.withColumn("rn", F.row_number().over(in_part))
        .filter(F.col("rn") <= SNM_WINDOW)
        .drop("rn")
        .withColumn("gid", F.col("pid") - 1)
        .filter(F.col("gid") >= 0)
    )
    grouped = keyed.withColumn("gid", F.col("pid")).unionByName(head)
    slide = Window.partitionBy("gid").orderBy(*order_cols)
    leads = F.array(
        *[F.lead("rec_id", k).over(slide) for k in range(1, SNM_WINDOW + 1)]
    )
    return (
        grouped.select(F.col("rec_id").alias("l"), leads.alias("ns"))
        .select("l", F.explode("ns").alias("r"))
        .filter(F.col("r").isNotNull())
        .select(
            F.least("l", "r").alias("a"), F.greatest("l", "r").alias("b")
        )
    )


ER_CC_MAX_ITERS = 15


#: Spark spelling of the symmetric-delete blocking neighborhood
#: (SymSpell / Mor-Fraenkel): the zero-trimmed digit string plus
#: every single-character deletion of it. Two strings within edit
#: distance 1 always share at least one key, so a join on these
#: keys is a LOSSLESS blocking for the lev<=1 verify — with key
#: cardinality that grows with the data (unlike a fixed band key)
#: and fan-out bounded by len(dstr)+1. Used by the streaming twin
#: (x_stream_entity_resolution); the batch op blocks by sorted
#: neighborhood instead so the two ops prove both classic schemes.
ER_DELKEYS_SQL = (
    "array_distinct(concat(array(dstr), "
    "transform(sequence(1, length(dstr)), i -> "
    "concat(substring(dstr, 1, i - 1), "
    "substring(dstr, i + 1, length(dstr) - i)))))"
)


# --- oracle SQL fragments, shared verbatim by the batch op and the
# --- streaming twin so the registry/featurize/verify/cluster logic
# --- has exactly ONE DuckDB spelling
_SQL_PREFIX = (
    "WITH RECURSIVE base AS (SELECT c_custkey AS ck, c_name AS nm, "
    "c_mktsegment AS seg, CAST(c_acctbal AS DOUBLE) AS bal FROM customer), "
    "reg AS ("
    "SELECT ck*4 AS rec_id, ck, nm AS name, seg, bal FROM base "
    "UNION ALL SELECT ck*4+1, ck, regexp_replace(nm, '#0+', '#'), seg, "
    "bal + (ck % 100) - 50 FROM base WHERE ck % 3 <> 0 "
    "UNION ALL SELECT ck*4+2, ck, substr(nm, 1, length(nm) - 5) || "
    "substr(nm, length(nm) - 3, 4), seg, bal - (ck % 80) "
    "FROM base WHERE ck % 5 = 2), "
    "feat AS (SELECT rec_id, ck, name, seg, bal, "
    "lower(regexp_replace(name, '[^a-zA-Z0-9]', '', 'g')) AS norm, "
    "CAST(nullif(regexp_replace(name, '[^0-9]', '', 'g'), '') AS BIGINT) "
    "AS dig, "
    "regexp_replace(regexp_replace(name, '[^0-9]', '', 'g'), '^0+', '') "
    "AS dstr FROM reg), "
    "tgt AS (SELECT rec_id, ck, seg, bal, dstr, "
    "list_distinct(list_transform(range(1, length(norm) - 1), "
    "i -> substr(norm, i, 3))) AS tg FROM feat), "
)

#: the multi-pass sorted-neighborhood candidate CTEs (batch op)
_SQL_SNM_CAND = (
    "o1 AS (SELECT rec_id, row_number() OVER (ORDER BY dig, norm, rec_id) "
    "AS rn FROM feat), "
    f"c1 AS (SELECT x.rec_id AS l, y.rec_id AS r FROM o1 x JOIN o1 y "
    f"ON y.rn > x.rn AND y.rn <= x.rn + {SNM_WINDOW}), "
    "o2 AS (SELECT rec_id, row_number() OVER "
    "(ORDER BY seg, bal, dig, rec_id) AS rn FROM feat), "
    f"c2 AS (SELECT x.rec_id AS l, y.rec_id AS r FROM o2 x JOIN o2 y "
    f"ON y.rn > x.rn AND y.rn <= x.rn + {SNM_WINDOW}), "
    "cand AS (SELECT DISTINCT least(l, r) AS a, greatest(l, r) AS b "
    "FROM (SELECT * FROM c1 UNION ALL SELECT * FROM c2)), "
)

#: the symmetric-delete candidate CTEs (streaming twin); the
#: blocking key is (segment, deletion-key) — segment equality is a
#: verify condition anyway, and folding it into the key divides
#: block sizes by the segment count before any pair materializes
_SQL_DELKEY_CAND = (
    "keys AS (SELECT rec_id, seg, "
    "unnest(list_distinct(list_prepend(dstr, "
    "list_transform(range(1, length(dstr) + 1), i -> "
    "substr(dstr, 1, i - 1) || substr(dstr, i + 1, length(dstr) - i))))) "
    "AS k FROM feat), "
    "cand AS (SELECT DISTINCT x.rec_id AS a, y.rec_id AS b "
    "FROM keys x JOIN keys y ON x.k = y.k AND x.seg = y.seg "
    "AND x.rec_id < y.rec_id), "
)

_SQL_VER_REACH = (
    "ver AS (SELECT cand.a, cand.b, fa.ck AS cka, fb.ck AS ckb "
    "FROM cand JOIN tgt fa ON fa.rec_id = cand.a "
    "JOIN tgt fb ON fb.rec_id = cand.b "
    f"WHERE fa.seg = fb.seg AND abs(fa.bal - fb.bal) <= {ER_BAL_TOL} "
    f"AND levenshtein(fa.dstr, fb.dstr) <= {ER_DIGIT_EDIT_MAX} "
    "AND CAST(length(list_intersect(fa.tg, fb.tg)) AS DOUBLE) / "
    "(length(fa.tg) + length(fb.tg) - "
    f"length(list_intersect(fa.tg, fb.tg))) >= {ER_JACCARD_MIN}), "
    "edges AS (SELECT a AS s, b AS t FROM ver "
    "UNION ALL SELECT b AS s, a AS t FROM ver), "
    "reach AS (SELECT rec_id AS id, rec_id AS comp FROM reg "
    "UNION SELECT e.t AS id, r.comp FROM reach r "
    "JOIN edges e ON e.s = r.id), "
    "lab AS (SELECT id, min(comp) AS comp FROM reach GROUP BY id), "
)

_SQL_COUNTS = (
    "mc AS (SELECT CAST(count(*) AS BIGINT) AS cand_pairs FROM cand), "
    "mv AS (SELECT CAST(count(*) AS BIGINT) AS ver_pairs, "
    "CAST(sum(CASE WHEN cka = ckb THEN 1 ELSE 0 END) AS BIGINT) AS "
    "tp_pairs FROM ver), "
    "mt AS (SELECT CAST(sum((n * (n - 1)) // 2) AS BIGINT) AS "
    "truth_pairs FROM (SELECT ck, count(*) AS n FROM reg GROUP BY ck)) "
)


def er_stream_oracle_sql() -> str:
    """Record-level DuckDB oracle for the streaming twin: the same
    registry/featurize/verify/cluster fragments, with
    symmetric-delete blocking instead of sorted neighborhood, graded
    per record (entity = min rec_id of the component) with the same
    funnel constants riding."""
    return (
        _SQL_PREFIX
        + _SQL_DELKEY_CAND
        + _SQL_VER_REACH
        + _SQL_COUNTS
        + "SELECT f.rec_id, l.comp AS entity, l.comp = f.rec_id AS "
        "is_keeper, mc.cand_pairs, mv.ver_pairs, mv.tp_pairs, "
        "mt.truth_pairs, (100 * mv.tp_pairs) // mv.ver_pairs AS "
        "precision_pct, (100 * mv.tp_pairs) // mt.truth_pairs AS "
        "recall_pct FROM feat f JOIN lab l ON l.id = f.rec_id "
        "CROSS JOIN mc CROSS JOIN mv CROSS JOIN mt ORDER BY f.rec_id"
    )


@register(
    "x_entity_resolution",
    oracle=(
        _SQL_PREFIX
        + _SQL_SNM_CAND
        + _SQL_VER_REACH
        + "la AS (SELECT lab.id, lab.comp, f.ck, f.name, f.bal "
        "FROM lab JOIN feat f ON f.rec_id = lab.id), "
        "cl AS (SELECT comp AS cluster_id, CAST(count(*) AS BIGINT) AS "
        "n_members, CAST(count(DISTINCT ck) AS BIGINT) AS n_entities "
        "FROM la GROUP BY comp), "
        "g AS (SELECT cluster_id, golden_name, golden_bal FROM "
        "(SELECT comp AS cluster_id, name AS golden_name, bal AS golden_bal, "
        "row_number() OVER (PARTITION BY comp ORDER BY bal DESC, id DESC) "
        "AS rnk FROM la) WHERE rnk = 1), "
        + _SQL_COUNTS
        + "SELECT cl.cluster_id, g.golden_name, g.golden_bal, cl.n_members, "
        "cl.n_entities, mc.cand_pairs, mv.ver_pairs, mv.tp_pairs, "
        "mt.truth_pairs, (100 * mv.tp_pairs) // mv.ver_pairs AS "
        "precision_pct, (100 * mv.tp_pairs) // mt.truth_pairs AS recall_pct "
        "FROM cl JOIN g USING (cluster_id) CROSS JOIN mc CROSS JOIN mv "
        "CROSS JOIN mt ORDER BY cluster_id"
    ),
    doc=(
        "Entity resolution end-to-end: deterministic dirty registry "
        "from customer (canonical + zero-strip + typo variants) -> "
        "multi-pass sorted-neighborhood blocking (O(n*w) candidates, "
        "range-partitioned with boundary replication — no global "
        "window) -> trigram-Jaccard + segment/balance verify -> "
        "connected components -> golden record per cluster, with the "
        "candidate/verified/true-pair funnel and integer "
        "precision/recall percentages riding every row. Ground truth "
        "is the generating custkey, so match quality is exactly "
        "graded, transitivity hazards included. Oracle: the same "
        "chain as one DuckDB recursive CTE."
    ),
    tags=("entity-resolution", "dedup", "clustering", "funnel"),
)
def x_entity_resolution(spark: SparkSession, sf: str) -> DataFrame:
    # LAZY checkpoints throughout: each one is materialized by the
    # next full-pass driver sync (count / changed-count) or by its
    # first consumer's job — the eager spelling paid one extra
    # driver-orchestrated job per cut, and per-query job count is
    # wall-clock at bench scale (compute is identical either way)
    feat = _featurized(spark, sf).localCheckpoint(eager=False)
    n_rows = feat.count()
    n_parts = max(
        1,
        min(
            spark.sparkContext.defaultParallelism,
            n_rows // _ROWS_PER_PART,
        ),
    )
    p1 = _snm_pairs(feat, ["dig", "norm", "rec_id"], n_parts)
    p2 = _snm_pairs(feat, ["seg", "bal", "dig", "rec_id"], n_parts)
    cand = p1.unionByName(p2).distinct().localCheckpoint(eager=False)

    fa = feat.select(
        F.col("rec_id").alias("a"),
        F.col("ck").alias("cka"),
        F.col("seg").alias("sega"),
        F.col("bal").alias("bala"),
        F.col("dstr").alias("dstra"),
        F.col("tg").alias("tga"),
        F.col("ntg").alias("ntga"),
    )
    fb = feat.select(
        F.col("rec_id").alias("b"),
        F.col("ck").alias("ckb"),
        F.col("seg").alias("segb"),
        F.col("bal").alias("balb"),
        F.col("dstr").alias("dstrb"),
        F.col("tg").alias("tgb"),
        F.col("ntg").alias("ntgb"),
    )
    inter = F.size(F.array_intersect("tga", "tgb"))
    ver = (
        cand.join(fa, "a")
        .join(fb, "b")
        .filter(
            (F.col("sega") == F.col("segb"))
            & (F.abs(F.col("bala") - F.col("balb")) <= ER_BAL_TOL)
            & (
                F.levenshtein("dstra", "dstrb") <= ER_DIGIT_EDIT_MAX
            )
        )
        .withColumn("i", inter)
        .filter(
            F.col("i").cast("double")
            / (F.col("ntga") + F.col("ntgb") - F.col("i"))
            >= ER_JACCARD_MIN
        )
        .select("a", "b", "cka", "ckb")
        .localCheckpoint(eager=False)
    )

    # connected components: min-label propagation, x_dedup_components
    # shape (bounded rounds, lineage cut per round, converged break)
    edges = (
        ver.select(F.col("a").alias("s"), F.col("b").alias("t"))
        .union(ver.select(F.col("b").alias("s"), F.col("a").alias("t")))
        .localCheckpoint(eager=False)
    )
    comp = feat.select(
        F.col("rec_id").alias("id"), F.col("rec_id").alias("comp")
    ).localCheckpoint(eager=False)
    for _ in range(ER_CC_MAX_ITERS):
        msgs = edges.join(comp, edges.s == comp.id).select(
            F.col("t").alias("id"), F.col("comp")
        )
        new = (
            comp.union(msgs)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=False)
        )
        changed = (
            new.alias("n")
            .join(comp.alias("c"), F.col("n.id") == F.col("c.id"))
            .filter(F.col("n.comp") != F.col("c.comp"))
            .count()
        )
        release_checkpoint(comp)
        comp = new
        if changed == 0:
            break

    la = comp.join(feat, comp.id == feat.rec_id).select(
        "id", "comp", "ck", "name", "bal"
    )
    cl = la.groupBy(F.col("comp").alias("cluster_id")).agg(
        F.count("*").alias("n_members"),
        F.countDistinct("ck").alias("n_entities"),
    )
    rnk = Window.partitionBy("comp").orderBy(
        F.col("bal").desc(), F.col("id").desc()
    )
    golden = (
        la.withColumn("rnk", F.row_number().over(rnk))
        .filter(F.col("rnk") == 1)
        .select(
            F.col("comp").alias("cluster_id"),
            F.col("name").alias("golden_name"),
            F.col("bal").alias("golden_bal"),
        )
    )

    mc = cand.agg(F.count("*").alias("cand_pairs"))
    mv = ver.agg(
        F.count("*").alias("ver_pairs"),
        F.sum(F.when(F.col("cka") == F.col("ckb"), 1).otherwise(0))
        .cast("bigint")
        .alias("tp_pairs"),
    )
    mt = (
        _registry(spark, sf)
        .groupBy("ck")
        .agg(F.count("*").alias("n"))
        .agg(
            F.sum(F.expr("(n * (n - 1)) div 2"))
            .cast("bigint")
            .alias("truth_pairs")
        )
    )
    return (
        cl.join(golden, "cluster_id")
        .crossJoin(F.broadcast(mc))
        .crossJoin(F.broadcast(mv))
        .crossJoin(F.broadcast(mt))
        .withColumn(
            "precision_pct", F.expr("(100 * tp_pairs) div ver_pairs")
        )
        .withColumn(
            "recall_pct", F.expr("(100 * tp_pairs) div truth_pairs")
        )
        .orderBy("cluster_id")
    )
