"""Similarity search over the ``embeddings`` table (vec_id, embedding
float[64], label).

Float discipline: similarities are computed on integer-quantized vectors
(round(x*1000) as bigint) so dot products are EXACT integers — identical on
any engine, any summation order, any partitioning. Cosine thresholds compare
qdot² against qnorm products in double with wide margins (never emitted).

Scale path: brute-force top-k broadcasts the (tiny) query set and scans the
corpus once — the right plan when queries ≪ corpus. The LSH variant buckets
by deterministic hyperplane sign bits so each query probes one bucket —
the 100 TB shape (bucketed storage, partition-pruned probes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_K = 5
_N_QUERIES = 10
_N_PLANES = 4
_DIM = 64


from pii_spark.util import read_table as _t  # noqa: E402


def _quant(col):
    return F.transform(col, lambda x: F.round(x * 1000).cast("long"))


def _qdot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"),
        lambda acc, x: acc + x)


_QUANT_SQL = "list_transform({col}, x -> CAST(round(x * 1000) AS BIGINT))"
_QDOT_SQL = ("list_sum(list_transform(generate_series(1, {dim}), "
             "i -> {a}[i] * {b}[i]))")


def register_queries(register) -> None:
    @register(
        "knn_bruteforce",
        oracle=f"""
        WITH q AS (SELECT vec_id AS query_id, {_QUANT_SQL.format(col='embedding')} AS qe
                   FROM embeddings WHERE vec_id < {_N_QUERIES}),
        c AS (SELECT vec_id, {_QUANT_SQL.format(col='embedding')} AS ce FROM embeddings),
        scored AS (
          SELECT query_id, vec_id,
                 CAST({_QDOT_SQL.format(dim=_DIM, a='qe', b='ce')} AS BIGINT) AS qdot
          FROM q CROSS JOIN c WHERE q.query_id <> c.vec_id
        )
        SELECT query_id, vec_id AS neighbor_id, qdot, rk FROM (
          SELECT query_id, vec_id, qdot,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY qdot DESC, vec_id) AS rk
          FROM scored
        ) r WHERE rk <= {_K} ORDER BY query_id, rk
        """,
    )
    def knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Brute-force top-k: broadcast the query set, one corpus scan,
        exact integer dot products, rank window per query."""
        from pyspark.sql import Window

        e = _t(spark, sf_dir, "embeddings")
        q = (e.where(f"vec_id < {_N_QUERIES}")
             .select(F.col("vec_id").alias("query_id"),
                     _quant("embedding").alias("qe")))
        c = e.select("vec_id", _quant("embedding").alias("ce"))
        scored = (
            c.crossJoin(F.broadcast(q))
            .where(F.col("query_id") != F.col("vec_id"))
            .select("query_id", "vec_id",
                    _qdot(F.col("qe"), F.col("ce")).alias("qdot"))
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("qdot").desc(), F.col("vec_id"))
        return (
            scored.withColumn("rk", F.row_number().over(w).cast("long"))
            .where(f"rk <= {_K}")
            .select("query_id", F.col("vec_id").alias("neighbor_id"),
                    "qdot", "rk")
            .orderBy("query_id", "rk")
        )

    # deterministic pseudo-random hyperplanes shared across engines:
    # plane j, dim i -> integer weight in [-9, 9]
    plane_w = "(CAST(({j} * 64 + i) * 2654435761 % 19 AS BIGINT) - 9)"
    sign_bit_sql = " || ".join(
        "(CASE WHEN list_sum(list_transform(generate_series(1, 64), "
        f"i -> e[i] * {plane_w.format(j=j)})) > 0 THEN '1' ELSE '0' END)"
        for j in range(_N_PLANES)
    )

    # multi-probe: the query's own bucket plus every bucket at Hamming
    # distance 1 (one sign bit flipped) — _N_PLANES+1 probes per query
    flip_sql = " UNION ALL ".join(
        f"SELECT query_id, qe, substr(bucket, 1, {j - 1}) || "
        f"(CASE WHEN substr(bucket, {j}, 1) = '1' THEN '0' ELSE '1' END) || "
        f"substr(bucket, {j + 1}) AS probe FROM q"
        for j in range(1, _N_PLANES + 1)
    )

    @register(
        "knn_lsh",
        oracle=f"""
        WITH qv AS (SELECT vec_id, {_QUANT_SQL.format(col='embedding')} AS e
                    FROM embeddings),
        keyed AS (SELECT vec_id, e, {sign_bit_sql} AS bucket FROM qv),
        q AS (SELECT vec_id AS query_id, e AS qe, bucket FROM keyed
              WHERE vec_id < {_N_QUERIES}),
        probes AS (
          SELECT query_id, qe, bucket AS probe FROM q
          UNION ALL
          {flip_sql}
        ),
        scored AS (
          SELECT p.query_id, k.vec_id,
                 CAST({_QDOT_SQL.format(dim=_DIM, a='qe', b='k.e')} AS BIGINT) AS qdot
          FROM probes p JOIN keyed k
            ON p.probe = k.bucket AND p.query_id <> k.vec_id
        )
        SELECT query_id, vec_id AS neighbor_id, qdot, rk FROM (
          SELECT query_id, vec_id, qdot,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY qdot DESC, vec_id) AS rk
          FROM scored
        ) r WHERE rk <= {_K} ORDER BY query_id, rk
        """,
    )
    def knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Multi-probe LSH ANN: 4 deterministic hyperplane sign bits form
        the bucket key; each query probes its own bucket PLUS the 4 buckets
        one bit-flip away (Hamming radius 1) — the standard multi-probe
        trade: ~5/16 of the corpus scanned instead of 1/16. Measured
        recall@5 vs exact top-k: 0.38 (was 0.10 single-probe) on the
        synthetic near-uniform embeddings, where the random-scan baseline
        for a 5/16 probe fraction is ~0.31 — real clustered embeddings
        separate much further; the IVF variant (which adapts its probe set)
        reaches 0.84 on the same corpus
        (tests/test_spark_ops_semantics.py::test_ann_recall_vs_bruteforce).
        The bucket join shuffles (bucket, vec) — at 100 TB the corpus would
        be *written* bucketed (util.write_bucketed_table) so probes are
        partition-pruned scans with zero shuffle."""
        from pyspark.sql import Window

        e = _t(spark, sf_dir, "embeddings").select(
            "vec_id", _quant("embedding").alias("e"))

        def bucket(col):
            # NB: capture j via factory — a 3-arg lambda would be misread
            def weight(j):
                return lambda x, i: x * (
                    ((F.lit(j) * 64 + i) * 2654435761 % 19).cast("long") - 9)

            bits = []
            for j in range(_N_PLANES):
                s = F.aggregate(
                    F.zip_with(col, F.sequence(F.lit(1), F.lit(_DIM)), weight(j)),
                    F.lit(0).cast("long"), lambda acc, x: acc + x)
                bits.append(F.when(s > 0, "1").otherwise("0"))
            return F.concat(*bits)

        def flip(j: int) -> F.Column:
            return F.concat(
                F.substring("bucket", 1, j - 1),
                F.when(F.substring("bucket", j, 1) == "1", "0").otherwise("1"),
                F.expr(f"substring(bucket, {j + 1})"),
            )

        keyed = e.withColumn("bucket", bucket(F.col("e")))
        q = keyed.where(f"vec_id < {_N_QUERIES}").select(
            F.col("vec_id").alias("query_id"), F.col("e").alias("qe"), "bucket")
        probes = q.select(
            "query_id", "qe",
            F.explode(F.array(
                F.col("bucket"),
                *[flip(j) for j in range(1, _N_PLANES + 1)],
            )).alias("bucket"),
        )
        scored = (
            keyed.join(F.broadcast(probes), "bucket")
            .where(F.col("query_id") != F.col("vec_id"))
            .select("query_id", "vec_id",
                    _qdot(F.col("qe"), F.col("e")).alias("qdot"))
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("qdot").desc(), F.col("vec_id"))
        return (
            scored.withColumn("rk", F.row_number().over(w).cast("long"))
            .where(f"rk <= {_K}")
            .select("query_id", F.col("vec_id").alias("neighbor_id"),
                    "qdot", "rk")
            .orderBy("query_id", "rk")
        )

    @register(
        "embedding_near_dup",
        oracle=f"""
        WITH base AS (SELECT vec_id, {_QUANT_SQL.format(col='embedding')} AS e
                      FROM embeddings),
        aug AS (
          SELECT vec_id, e FROM base
          UNION ALL
          SELECT vec_id + 10000 AS vec_id, e FROM base WHERE vec_id % 25 = 0
        ),
        probes AS (SELECT vec_id AS id_a, e AS ea FROM aug WHERE vec_id >= 10000),
        scored AS (
          SELECT id_a, b.vec_id AS id_b,
                 CAST({_QDOT_SQL.format(dim=_DIM, a='ea', b='b.e')} AS BIGINT) AS ab,
                 CAST({_QDOT_SQL.format(dim=_DIM, a='ea', b='ea')} AS BIGINT) AS aa,
                 CAST({_QDOT_SQL.format(dim=_DIM, a='b.e', b='b.e')} AS BIGINT) AS bb
          FROM probes CROSS JOIN aug b WHERE id_a <> b.vec_id
        )
        SELECT id_a, id_b FROM scored
        WHERE ab > 0 AND CAST(ab AS DOUBLE) * ab >= 0.9999 * aa * bb
        ORDER BY id_a, id_b
        """,
    )
    def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Embedding-cosine near-dup detection: injected copies (vec_id %
        25 = 0 → +10000) must pair with their originals at cosine ≈ 1.
        Threshold compares qdot² ≥ 0.9999·‖a‖²‖b‖² in double — no float
        similarity is ever emitted."""
        e = _t(spark, sf_dir, "embeddings").select(
            "vec_id", _quant("embedding").alias("e"))
        aug = e.unionByName(
            e.where("vec_id % 25 = 0")
            .select((F.col("vec_id") + 10000).alias("vec_id"), "e"))
        probes = aug.where("vec_id >= 10000").select(
            F.col("vec_id").alias("id_a"), F.col("e").alias("ea"))
        scored = (
            aug.crossJoin(F.broadcast(probes))
            .where(F.col("id_a") != F.col("vec_id"))
            .select(
                "id_a", F.col("vec_id").alias("id_b"),
                _qdot(F.col("ea"), F.col("e")).alias("ab"),
                _qdot(F.col("ea"), F.col("ea")).alias("aa"),
                _qdot(F.col("e"), F.col("e")).alias("bb"),
            )
        )
        keep = (F.col("ab") > 0) & (
            F.col("ab").cast("double") * F.col("ab")
            >= 0.9999 * F.col("aa") * F.col("bb"))
        return scored.where(keep).select("id_a", "id_b").orderBy("id_a", "id_b")

    _register_ivf(register)


def _register_ivf(register) -> None:
    n_cent = 8

    oracle = f"""
    WITH v AS (SELECT vec_id, {_QUANT_SQL.format(col='embedding')} AS e
               FROM embeddings),
    cent AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < {n_cent}),
    assign AS (
      SELECT vec_id, e, cid FROM (
        SELECT v.vec_id, v.e, cent.cid,
               row_number() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY {_QDOT_SQL.format(dim=_DIM, a='v.e', b='cent.ce')} DESC,
                          cent.cid) AS rn
        FROM v CROSS JOIN cent
      ) x WHERE rn = 1
    ),
    q AS (SELECT vec_id AS query_id, e AS qe, cid AS qcell FROM assign
          WHERE vec_id < {_N_QUERIES}),
    scored AS (
      SELECT query_id, a.vec_id,
             CAST({_QDOT_SQL.format(dim=_DIM, a='qe', b='a.e')} AS BIGINT) AS qdot
      FROM q JOIN assign a ON a.cid = q.qcell AND a.vec_id <> q.query_id
    )
    SELECT query_id, vec_id AS neighbor_id, qdot, rk FROM (
      SELECT query_id, vec_id, qdot,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY qdot DESC, vec_id) AS rk
      FROM scored
    ) r WHERE rk <= {_K} ORDER BY query_id, rk
    """

    @register("knn_ivf", oracle=oracle)
    def knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
        """IVF-style ANN: a deterministic coarse quantizer (the first 8
        vectors as centroids) partitions the corpus into cells; each query
        probes only its own cell. At 100 TB the corpus is *written*
        partitioned by cell id, so probes are partition-pruned scans — the
        assignment cross-join is corpus x 8 tiny broadcast rows, one pass."""
        from pyspark.sql import Window

        v = _t(spark, sf_dir, "embeddings").select(
            "vec_id", _quant("embedding").alias("e"))
        cent = v.where(f"vec_id < {n_cent}").select(
            F.col("vec_id").alias("cid"), F.col("e").alias("ce"))
        w_assign = Window.partitionBy("vec_id").orderBy(
            F.col("qd").desc(), F.col("cid"))
        assign = (
            v.crossJoin(F.broadcast(cent))
            .withColumn("qd", _qdot(F.col("e"), F.col("ce")))
            .withColumn("rn", F.row_number().over(w_assign))
            .where("rn = 1")
            .select("vec_id", "e", "cid")
        )
        q = assign.where(f"vec_id < {_N_QUERIES}").select(
            F.col("vec_id").alias("query_id"), F.col("e").alias("qe"),
            F.col("cid").alias("qcell"))
        scored = (
            assign.join(F.broadcast(q),
                        (assign.cid == q.qcell)
                        & (assign.vec_id != q.query_id))
            .select("query_id", "vec_id",
                    _qdot(F.col("qe"), F.col("e")).alias("qdot"))
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("qdot").desc(), F.col("vec_id"))
        return (
            scored.withColumn("rk", F.row_number().over(w).cast("long"))
            .where(f"rk <= {_K}")
            .select("query_id", F.col("vec_id").alias("neighbor_id"),
                    "qdot", "rk")
            .orderBy("query_id", "rk")
        )
