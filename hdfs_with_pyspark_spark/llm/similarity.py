"""Similarity search over the ``embeddings`` table (array<float> vectors).

Driver-mandated LLM-pipeline surface (SURVEY.md §0 addendum). Three
operators:

  * ann_topk_bruteforce — exact top-k cosine neighbors for a query set:
    broadcast the (small) query side against the corpus, rank with a
    window. The correctness baseline every ANN variant is measured
    against.
  * ann_topk_lsh — the scale path: sign-bit LSH bucketing (fixed
    axis-aligned hyperplanes = sign of the first B dims), equi-join on
    bucket, rank within bucket. Deterministic — no RNG — so it has an
    exact SQL oracle; recall loss vs brute force is a *property*, not a
    comparison artifact.
  * dedup_embedding_cosine — near-dup pairs by cosine >= threshold
    (brute-force half-matrix here; at scale the same verify runs behind
    the LSH bucket join).

All vector math is pure SQL expressions over array<double> (floats
upcast first so both engines do identical IEEE-double arithmetic): dots
are unrolled element_at sums emitted as SQL text — one JVM-side parse,
whole-stage codegen, and the exact left-associative summation order of a
sequential fold — with each vector's norm computed once and carried as a
column. Ranking/thresholding always uses ROUND(cos, 6) so last-ulp
differences between engines cannot flip an order or a threshold.

At 100 TB: the brute-force path is O(|Q| x |corpus|) with the query side
broadcast — correct shape for small Q. The LSH path shuffles the corpus
once on bucket id; skewed buckets are AQE's problem (skew-join splitting
works because the join is a plain equi-join).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdfs_with_pyspark_spark.plans.registry import register, ensure_session
from hdfs_with_pyspark_spark.sources.io import read_table

N_QUERIES = 10      # vec_id < 10 is the query set
TOP_K = 5
LSH_SIGN_DIMS = 4   # 16 buckets; at real scale use 8-12 dims + multiprobe
COSINE_DUP_THRESHOLD = 0.45  # synthetic vectors are near-orthogonal; 0.45
                             # captures the ~dozen closest pairs at sf0.01


EMBED_DIM = 64  # testdata embedding width (TESTDATA.md)


def _dot(a, b, dim: int | None = None):
    """Dot product of two array<double> columns.

    With ``dim`` (the fixed corpus width): unrolled sum of element_at
    terms, left-associative ((0 + t1) + t2) + ... — the exact summation
    order of a sequential fold, so results are bit-identical to the
    fold form — but the whole expression stays in whole-stage codegen.
    Spark evaluates higher-order functions interpreted per element;
    unrolling measured ~10x faster on the 64-dim corpus.

    Without ``dim``: the generic fold, for variable-length arrays.

    ``dim`` is an upper bound, not an exact requirement: positions past an
    array's end contribute an exact +0.0 (try_element_at -> NULL ->
    coalesce 0.0), which never changes the sum.
    """
    if dim is None:
        return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                           F.lit(0.0), lambda acc, x: acc + x)
    acc = F.lit(0.0)
    for i in range(1, dim + 1):
        acc = acc + F.coalesce(F.try_element_at(a, F.lit(i))
                               * F.try_element_at(b, F.lit(i)), F.lit(0.0))
    return acc


def _norm(a, dim: int | None = None):
    return F.sqrt(_dot(a, a, dim))


def _sql_dot_cols(a: str, b: str, dim: int = EMBED_DIM) -> str:
    """SQL text of the unrolled dot product of two array columns.

    Identical op sequence to ``_dot(..., dim)`` — left-associative sum
    seeded with 0.0, missing positions contributing an exact +0.0 — but
    parsed JVM-side in one shot, where the Column-operator form costs one
    Py4J round-trip per node (~hundreds of ms per 64-dim dot)."""
    terms = " + ".join(
        f"coalesce(try_element_at({a}, {i}) * try_element_at({b}, {i}), 0.0D)"
        for i in range(1, dim + 1))
    return f"(0.0D + {terms})"


def _with_norm(df: DataFrame, vcol: str, out: str) -> DataFrame:
    """Attach the vector's L2 norm as a column, computed once per row and
    reused across every pair scoring that involves the row (the oracle
    recomputes sqrt(list_dot_product) per pair from the identical IEEE op
    sequence, so values are bit-equal)."""
    return df.withColumn(out, F.expr(f"sqrt({_sql_dot_cols(vcol, vcol)})"))


def cosine(a, b, dim: int | None = None):
    """Cosine similarity of two array<double> columns (Column expr).

    Pass ``dim`` when the width is fixed and known (all corpus queries
    do) to get the codegen'd unrolled form.
    """
    return _dot(a, b, dim) / (_norm(a, dim) * _norm(b, dim))


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (read_table(spark, sf_dir, "embeddings")
            .select("vec_id", F.col("embedding").cast("array<double>").alias("v")))


_SQL_VECTORS = "SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings"
_SQL_COS = ("list_dot_product(a.v, b.v) / "
            "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))")


# --------------------------------------------------------------------------
# ann_topk_bruteforce — exact top-k. The query side (10 rows) broadcasts;
# the corpus never shuffles. Rank on (round(cos,6) DESC, vec_id ASC) —
# fully deterministic under float noise.
# --------------------------------------------------------------------------
@register("ann_topk_bruteforce", oracle=f"""
WITH v AS ({_SQL_VECTORS}),
q AS (SELECT * FROM v WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         ROUND({_SQL_COS}, 6) AS cos_sim
  FROM q a JOIN v b ON a.vec_id <> b.vec_id),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM scored)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cos_sim
FROM ranked WHERE rank <= {TOP_K}
""")
def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_session(spark)
    v = _with_norm(_vectors(spark, sf_dir), "v", "nv")
    q = v.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
        F.col("nv").alias("qnv"))
    scored = (F.broadcast(q)
              .join(v, F.col("query_id") != F.col("vec_id"))
              .select("query_id", F.col("vec_id").alias("neighbor_id"),
                      F.round(F.expr(_sql_dot_cols("qv", "v"))
                              / (F.col("qnv") * F.col("nv")), 6).alias("cos_sim")))
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(),
                                               F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
                  .where(F.col("rank") <= TOP_K)
                  .select("query_id", "neighbor_id", "rank", "cos_sim"))


# --------------------------------------------------------------------------
# ann_topk_lsh — sign-bit bucketed ANN. Bucket = sum of sign(v[i])<<i for
# the first LSH_SIGN_DIMS dims (fixed hyperplanes — deterministic, exact
# oracle). Candidates = same-bucket corpus rows; then the same rank.
# --------------------------------------------------------------------------
_SQL_BUCKET = ("list_sum(list_transform(generate_series(1, " + str(LSH_SIGN_DIMS) + "), "
               "i -> CASE WHEN v[i] >= 0 THEN 1::BIGINT << (i - 1) ELSE 0::BIGINT END))")

@register("ann_topk_lsh", oracle=f"""
WITH v0 AS ({_SQL_VECTORS}),
v AS (SELECT vec_id, v, {_SQL_BUCKET} AS bucket FROM v0),
q AS (SELECT * FROM v WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         ROUND({_SQL_COS}, 6) AS cos_sim
  FROM q a JOIN v b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM scored)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cos_sim
FROM ranked WHERE rank <= {TOP_K}
""")
def ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_session(spark)
    bucket = F.lit(0).cast("long")
    for i in range(LSH_SIGN_DIMS):
        bucket = bucket + F.when(F.element_at(F.col("v"), i + 1) >= 0,
                                 F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    v = _with_norm(_vectors(spark, sf_dir).withColumn("bucket", bucket), "v", "nv")
    q = v.select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
                 F.col("nv").alias("qnv"), "bucket").where(F.col("query_id") < N_QUERIES)
    scored = (F.broadcast(q)
              .join(v, ["bucket"])
              .where(F.col("query_id") != F.col("vec_id"))
              .select("query_id", F.col("vec_id").alias("neighbor_id"),
                      F.round(F.expr(_sql_dot_cols("qv", "v"))
                              / (F.col("qnv") * F.col("nv")), 6).alias("cos_sim")))
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(),
                                               F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
                  .where(F.col("rank") <= TOP_K)
                  .select("query_id", "neighbor_id", "rank", "cos_sim"))


# --------------------------------------------------------------------------
# ann_topk_ivf — inverted-file ANN: a coarse quantizer assigns every
# corpus vector to its nearest centroid (the inverted list); a query
# scores only the vectors in its nprobe closest lists. Centroids here are
# the first N_CENTROIDS corpus vectors — deterministic, so the oracle can
# replicate the quantizer exactly; production swaps in k-means centroids
# (an offline iterative job) without changing this query shape.
# At 100 TB: one shuffle of the corpus on list id; queries broadcast;
# per-list fan-out is |corpus| * nprobe / n_lists.
# --------------------------------------------------------------------------
N_CENTROIDS = 8
NPROBE = 2

_SQL_ASSIGN = f"""
cent AS (SELECT vec_id AS cid, v AS cv FROM v WHERE vec_id < {N_CENTROIDS}),
assign AS (
  SELECT vec_id, v, cid FROM (
    SELECT b.vec_id, b.v, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY b.vec_id
             ORDER BY ROUND(list_dot_product(b.v, c.cv)
                            / (sqrt(list_dot_product(b.v, b.v))
                               * sqrt(list_dot_product(c.cv, c.cv))), 6) DESC,
                      c.cid ASC) AS rn
    FROM v b CROSS JOIN cent c
  ) WHERE rn = 1),
probes AS (
  SELECT vec_id AS query_id, cid FROM (
    SELECT q.vec_id, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY q.vec_id
             ORDER BY ROUND(list_dot_product(q.v, c.cv)
                            / (sqrt(list_dot_product(q.v, q.v))
                               * sqrt(list_dot_product(c.cv, c.cv))), 6) DESC,
                      c.cid ASC) AS rn
    FROM v q CROSS JOIN cent c WHERE q.vec_id < {N_QUERIES}
  ) WHERE rn <= {NPROBE})"""


@register("ann_topk_ivf", oracle=f"""
WITH v AS ({_SQL_VECTORS}),
{_SQL_ASSIGN},
scored AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         ROUND(list_dot_product(q.v, a.v)
               / (sqrt(list_dot_product(q.v, q.v))
                  * sqrt(list_dot_product(a.v, a.v))), 6) AS cos_sim
  FROM probes p
  JOIN v q ON q.vec_id = p.query_id
  JOIN assign a ON a.cid = p.cid AND a.vec_id <> p.query_id),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM scored)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cos_sim
FROM ranked WHERE rank <= {TOP_K}
""")
def ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_session(spark)
    v = _vectors(spark, sf_dir)
    # Centroids are a handful of rows: collect them and inline as literal
    # arrays. element_at on a literal array constant-folds, so each
    # centroid's cosine is a flat codegen'd expression, and the corpus-side
    # list assignment becomes a ZERO-shuffle map-side argmax — greatest()
    # over (cos, -cid) structs replicates the (cos DESC, cid ASC) ranking.
    # The old shape (broadcast NLJ x centroids + row_number window) paid a
    # corpus x n_centroids exchange just to pick rn=1.
    # Dots are assembled as SQL text and parsed with ONE F.expr each:
    # building the same unrolled tree with Column operators costs
    # thousands of Py4J round-trips (~20s of driver time); the SQL parser
    # does it JVM-side in milliseconds. Each side's norm is computed once
    # and carried as a column — shared by centroid ranking and the final
    # pair scoring, where the oracle recomputes sqrt(list_dot_product)
    # from the identical IEEE op sequence.
    # (A zero-shuffle variant — argmax over 8 inlined centroid-literal
    # dots per row — was tried and reverted: 8 x 64 unrolled terms blew
    # up codegen compile time far past what the small window exchange
    # costs. The corpus pays ONE dimension-sized broadcast NLJ + window.)
    v2 = v.withColumn("nv", F.expr(f"sqrt({_sql_dot_cols('v', 'v')})"))
    cent = (v2.where(F.col("vec_id") < N_CENTROIDS)
              .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"),
                      F.col("nv").alias("cnv")))
    cos_c = F.round(F.expr(_sql_dot_cols("v", "cv"))
                    / (F.col("nv") * F.col("cnv")), 6)

    def rank_centroids(side: DataFrame, id_col: str, keep: int) -> DataFrame:
        scored = (side.join(F.broadcast(cent), F.lit(True))
                      .select(id_col, "v", "nv", "cid", cos_c.alias("c")))
        w = Window.partitionBy(id_col).orderBy(F.col("c").desc(), F.col("cid").asc())
        return (scored.withColumn("__rn", F.row_number().over(w))
                      .where(F.col("__rn") <= keep)
                      .drop("__rn", "c"))

    assign = rank_centroids(v2, "vec_id", 1)
    probes = (rank_centroids(v2.where(F.col("vec_id") < N_QUERIES)
                               .select(F.col("vec_id").alias("query_id"), "v", "nv"),
                             "query_id", NPROBE)
              .select("query_id", F.col("v").alias("qv"),
                      F.col("nv").alias("qnv"), "cid"))
    scored = (F.broadcast(probes)
              .join(assign, "cid")
              .where(F.col("query_id") != F.col("vec_id"))
              .select("query_id", F.col("vec_id").alias("neighbor_id"),
                      F.round(F.expr(_sql_dot_cols("qv", "v"))
                              / (F.col("qnv") * F.col("nv")), 6)
                       .alias("cos_sim")))
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(),
                                               F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
                  .where(F.col("rank") <= TOP_K)
                  .select("query_id", "neighbor_id", "rank", "cos_sim"))


# --------------------------------------------------------------------------
# embedding_label_centroids — per-label mean vector via grouped
# applyInPandas: the batch custom-operator surface (Arrow ships each
# label's vectors to one pandas function; numpy does the column mean).
# Output is long-form (label, dim, v) so the float compare is elementwise.
# Scale shape: one shuffle on label; state per group is a single vector.
# --------------------------------------------------------------------------
def _centroid_of_group(pdf):
    import numpy as np
    mat = np.stack(pdf["v"].to_list())          # |group| x dim
    mean = mat.mean(axis=0)
    out = pd.DataFrame({"dim": np.arange(len(mean), dtype="int64"),
                        "v": np.round(mean, 6)})
    out.insert(0, "label", int(pdf["label"].iloc[0]))
    return out


@register("embedding_label_centroids", oracle="""
WITH e AS (
  SELECT label, unnest(embedding::DOUBLE[]) AS x,
         generate_subscripts(embedding, 1) - 1 AS dim
  FROM embeddings)
SELECT CAST(label AS BIGINT) AS label, CAST(dim AS BIGINT) AS dim,
       ROUND(AVG(x), 6) AS v
FROM e GROUP BY label, dim
""")
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_session(spark)
    import pyspark.sql.types as T
    schema = T.StructType([
        T.StructField("label", T.LongType()),
        T.StructField("dim", T.LongType()),
        T.StructField("v", T.DoubleType()),
    ])
    vecs = (read_table(spark, sf_dir, "embeddings")
            .select(F.col("label").cast("long").alias("label"),
                    F.col("embedding").cast("array<double>").alias("v")))
    return vecs.groupBy("label").applyInPandas(_centroid_of_group, schema)


# --------------------------------------------------------------------------
# dedup_embedding_cosine — near-dup pairs with cosine >= threshold.
# Half-matrix self-join (vec_a < vec_b); threshold compared on the
# ROUNDed value so both engines cut identically.
# --------------------------------------------------------------------------
@register("dedup_embedding_cosine", oracle=f"""
WITH v AS ({_SQL_VECTORS})
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       ROUND({_SQL_COS}, 6) AS cos_sim
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE ROUND({_SQL_COS}, 6) >= {COSINE_DUP_THRESHOLD}
""")
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_session(spark)
    v = _with_norm(_vectors(spark, sf_dir), "v", "nv")
    a = v.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"),
                 F.col("nv").alias("na"))
    b = v.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"),
                 F.col("nv").alias("nb"))
    return (a.join(b, F.col("vec_a") < F.col("vec_b"))
             .select("vec_a", "vec_b",
                     F.round(F.expr(_sql_dot_cols("va", "vb"))
                             / (F.col("na") * F.col("nb")), 6).alias("cos_sim"))
             .where(F.col("cos_sim") >= COSINE_DUP_THRESHOLD))


# --------------------------------------------------------------------------
# embedding_quantize — per-vector int8 scalar quantization, the storage
# path for 100 TB embedding stores (4x smaller than float32; recall loss
# bounded by per-vector range). q[i] = round((v[i] - min) / (max - min)
# * 254) - 127, with (min, max, scale) kept for dequantization. Emitted
# long-form (vec_id, dim, q) so the oracle compares elementwise; the
# row-wise min/max/round arithmetic is integer-exact across engines.
# --------------------------------------------------------------------------
@register("embedding_quantize", oracle=f"""
WITH v AS ({_SQL_VECTORS}),
b AS (SELECT vec_id, v, list_min(v) AS lo, list_max(v) AS hi FROM v),
e AS (SELECT vec_id, lo, hi, unnest(v) AS x,
             generate_subscripts(v, 1) - 1 AS dim
      FROM b)
SELECT vec_id,
       CAST(dim AS BIGINT) AS dim,
       CAST(CASE WHEN hi = lo THEN 0
                 ELSE ROUND((x - lo) / (hi - lo) * 254) - 127
            END AS BIGINT) AS q
FROM e
""")
def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_session(spark)
    v = _vectors(spark, sf_dir)
    b = v.select("vec_id", "v",
                 F.array_min("v").alias("lo"), F.array_max("v").alias("hi"))
    kv = b.select("vec_id", "lo", "hi",
                  F.posexplode("v").alias("dim", "x"))
    q = (F.when(F.col("hi") == F.col("lo"), F.lit(0))
          .otherwise(F.round((F.col("x") - F.col("lo"))
                             / (F.col("hi") - F.col("lo")) * 254) - 127))
    return kv.select("vec_id", F.col("dim").cast("long").alias("dim"),
                     q.cast("long").alias("q"))
