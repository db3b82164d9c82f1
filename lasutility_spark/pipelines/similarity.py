"""Similarity search over the ``embeddings`` table (array<float>, 64-dim).

Integer-exact design: embeddings are quantized ``floor(v * 100)`` so dot
products are exact int64 arithmetic — identical in Spark and DuckDB, no
FP-summation-order hazard.  Operators:

- brute-force top-k (the baseline): bounded cross join + window rank
- LSH-bucketed ANN (the scale path): sign-bit buckets against fixed
  integer hyperplanes -> candidates only within a bucket
- near-duplicate pairs by quantized cosine
- k-NN majority-label classification

At 10^12 scale only the LSH path survives: buckets are an equi-join key
(shuffle-bounded, AQE-skew-splittable), and the expensive exact re-rank
runs per bucket.  The brute-force path exists as the correctness oracle.
"""

from __future__ import annotations

DIM = 64
N_PLANES = 8


def _hyperplane(j: int) -> list[int]:
    """Fixed deterministic integer hyperplanes in {-3..3}^64."""
    return [((i * 31 + j * 17 + (i * j) % 5) % 7) - 3 for i in range(DIM)]


def _qdot(dialect: str, a: str, b: str) -> str:
    """Exact integer dot product of quantized (x100) embeddings."""
    if dialect == "spark":
        return (
            f"aggregate(sequence(1, {DIM}), 0L, (acc, i) -> acc + "
            f"CAST(FLOOR(CAST(element_at({a}, i) AS DOUBLE) * 100.0) AS BIGINT) * "
            f"CAST(FLOOR(CAST(element_at({b}, i) AS DOUBLE) * 100.0) AS BIGINT))"
        )
    # DuckDB's list_sum returns HUGEINT (int128); Spark's aggregate returns
    # BIGINT.  The driver hashes typed values, so cast to BIGINT explicitly.
    return (
        f"CAST(list_sum(list_transform(range(1, {DIM} + 1), i -> "
        f"CAST(FLOOR(CAST({a}[i] AS DOUBLE) * 100.0) AS BIGINT) * "
        f"CAST(FLOOR(CAST({b}[i] AS DOUBLE) * 100.0) AS BIGINT))) AS BIGINT)"
    )


def _plane_dot(dialect: str, a: str, j: int) -> str:
    """Integer dot with a literal hyperplane."""
    plane = _hyperplane(j)
    if dialect == "spark":
        arr = "array(" + ", ".join(str(v) for v in plane) + ")"
        return (
            f"aggregate(sequence(1, {DIM}), 0L, (acc, i) -> acc + "
            f"CAST(FLOOR(CAST(element_at({a}, i) AS DOUBLE) * 100.0) AS BIGINT) * "
            f"element_at({arr}, i))"
        )
    arr = "[" + ", ".join(str(v) for v in plane) + "]"
    return (
        f"CAST(list_sum(list_transform(range(1, {DIM} + 1), i -> "
        f"CAST(FLOOR(CAST({a}[i] AS DOUBLE) * 100.0) AS BIGINT) * {arr}[i])) AS BIGINT)"
    )


def norms_sql(dialect: str) -> str:
    """Quantized squared norm per vector (exact int)."""
    return f"SELECT vec_id, label, {_qdot(dialect, 'embedding', 'embedding')} AS norm2 FROM embeddings"


def ann_topk_sql(dialect: str, n_queries: int = 10, k: int = 5) -> str:
    """Brute-force top-k by exact integer dot for the first n query
    vectors; rank ties broken by vec_id (fully deterministic)."""
    dot = _qdot(dialect, "q.embedding", "c.embedding")
    return f"""
    SELECT query_id, neighbor_id, dot, rnk
    FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {dot} AS dot,
             ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY {dot} DESC, c.vec_id
             ) AS rnk
      FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < {n_queries}
    ) t
    WHERE rnk <= {k}
    """


def ann_topk_spark(spark, n_queries: int = 10, k: int = 5):
    """Brute-force top-k, scale path: one Arrow-batched int64 matmul
    per partition against the broadcast query matrix, per-batch local
    top-k, then a tiny global re-rank — identical arithmetic and
    tie-breaks (dot DESC, vec_id ASC) to :func:`ann_topk_sql`, pinned
    by a parity test.

    Scale shape: the query matrix is a closure broadcast (n_queries x
    DIM ints), the candidate scan is embarrassingly parallel with no
    join, and only ``n_queries * k`` rows per batch survive to the
    final exchange — the global top-k is a subset of every batch's
    local top-k, so the union is lossless.  This is the canonical
    brute-force ANN plan for a 10^9-vector corpus; the LSH/IVF paths
    bound candidates when even one full scan is too much.

    Validity envelope (measured): at the sandbox fixture size (2k
    vectors) the SQL form wins on fixed cost (no query-collect job, no
    Python workers), so ``queries()`` keeps it; the matmul path's
    per-vector cost is ~100x lower (numpy BLAS vs an interpreted
    Catalyst HOF lambda), which dominates from ~10^5 vectors up."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    emb = spark.table("embeddings")
    qrows = (
        emb.filter(F.col("vec_id") < n_queries)
        .select("vec_id", "embedding")
        .collect()
    )
    if not qrows:  # no vectors under n_queries -> empty result, not a
        # zero-width matmul inside the UDF
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, dot long, rnk int"
        )
    qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    # CAST(float AS DOUBLE) is exact widening; *100.0 and FLOOR in float64
    # replay the SQL expression bit-for-bit
    qmat = np.floor(
        np.array([r["embedding"] for r in qrows], dtype=np.float64) * 100.0
    ).astype(np.int64)

    def gen(batches):
        for pdf in batches:
            cand = np.floor(
                np.stack(pdf["embedding"].to_numpy()).astype(np.float64) * 100.0
            ).astype(np.int64)
            cid = pdf["vec_id"].to_numpy(np.int64)
            dots = cand @ qmat.T  # batch x n_queries, exact int64
            out = []
            for j in range(len(qids)):
                mask = cid != qids[j]
                d, ids = dots[mask, j], cid[mask]
                if not len(ids):
                    continue
                order = np.lexsort((ids, -d))[: min(k, len(ids))]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": np.full(len(order), qids[j]),
                            "neighbor_id": ids[order],
                            "dot": d[order],
                        }
                    )
                )
            if out:
                yield pd.concat(out, ignore_index=True)

    local = emb.select("vec_id", "embedding").mapInPandas(
        gen, "query_id long, neighbor_id long, dot long"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("dot"), F.asc("neighbor_id")
    )
    return (
        local.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "dot", "rnk")
    )


def lsh_buckets_sql(dialect: str) -> str:
    """Sign-bit LSH bucket id per vector (the scale path's partition key)."""
    bits = " + ".join(
        f"(CASE WHEN {_plane_dot(dialect, 'embedding', j)} > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(N_PLANES)
    )
    return f"SELECT vec_id, label, CAST({bits} AS BIGINT) AS bucket FROM embeddings"


def lsh_candidate_pairs_sql(dialect: str) -> str:
    """Same-bucket candidate pairs with their exact integer dot —
    bucket equi-join then per-pair verification (ANN at scale)."""
    buckets = lsh_buckets_sql(dialect)
    dot = _qdot(dialect, "ea.embedding", "eb.embedding")
    return f"""
    WITH b AS ({buckets})
    SELECT a.vec_id AS vec_a, bb.vec_id AS vec_b, a.bucket,
           {dot} AS dot
    FROM b a
    JOIN b bb ON a.bucket = bb.bucket AND a.vec_id < bb.vec_id
    JOIN embeddings ea ON ea.vec_id = a.vec_id
    JOIN embeddings eb ON eb.vec_id = bb.vec_id
    """


def near_dup_pairs_sql(dialect: str, cos_x1000: int = 400) -> str:
    """Embedding near-duplicates: same-bucket pairs whose quantized cosine
    (x1e6, floor) clears a threshold — cosine via exact integer
    dot^2 * 1e12 / (n2a * n2b) compared against threshold^2.

    Default threshold 0.40: the driver's synthetic embeddings are
    near-orthogonal (max pairwise cosine ~0.51 at sf0.01), so a classic
    0.95 dedup cut matches zero rows and the oracle comparison would be
    vacuous; 0.40 exercises the full join+filter arithmetic on real
    pairs.  Production near-dup dedup uses 0.9+."""
    pairs = lsh_candidate_pairs_sql(dialect)
    norms = norms_sql(dialect)
    thr2 = cos_x1000 * cos_x1000  # compare dot^2*1e6 vs thr2*n2a*n2b
    return f"""
    WITH pairs AS ({pairs}), n AS ({norms})
    SELECT vec_a, vec_b, dot, na.norm2 AS norm2_a, nb.norm2 AS norm2_b
    FROM pairs
    JOIN n na ON na.vec_id = vec_a
    JOIN n nb ON nb.vec_id = vec_b
    WHERE dot > 0
      AND dot * dot * 1000000 >= {thr2} * na.norm2 * nb.norm2
    """


def knn_label_sql(dialect: str, n_queries: int = 20, k: int = 5) -> str:
    """k-NN majority-vote label for the first n vectors (exclude self);
    ties broken by smaller label (deterministic)."""
    topk = ann_topk_sql(dialect, n_queries, k)
    return f"""
    WITH topk AS ({topk})
    SELECT query_id, predicted_label
    FROM (
      SELECT query_id, label AS predicted_label,
             ROW_NUMBER() OVER (
               PARTITION BY query_id
               ORDER BY COUNT(*) DESC, label
             ) AS rn
      FROM topk JOIN embeddings e ON e.vec_id = topk.neighbor_id
      GROUP BY query_id, label
    ) t
    WHERE rn = 1
    """


# --- IVF (inverted-file) ANN: coarse quantizer + within-list search -------

K_CENTROIDS = 8


def _centroid(j: int) -> list[int]:
    """Fixed deterministic integer centroids: rotations of one base
    vector, so every centroid has the SAME norm and the argmin is
    decided purely by direction (unequal norms would send every vector
    to the smallest-norm list)."""
    base = [((i * 31 + 17) % 7) - 3 for i in range(DIM)]
    return [base[(i + j * 8) % DIM] for i in range(DIM)]


def _centroid_key(dialect: str, a: str, j: int) -> str:
    """Partial integer distance key of vector ``a`` (quantized x100) to
    centroid j: S^2*|c|^2 - 2*S*dot(vq, c) with S=100.  The |vq|^2 term
    is constant per vector and drops out of the argmin, but WITHOUT it
    the key can go negative for large embeddings, which breaks the
    ``LEAST(key*K + j) % K`` argmin encoding — callers must add |vq|^2
    back (see :func:`ivf_assign_sql`) so keys are true squared
    distances |vq - S*c|^2 >= 0."""
    c = _centroid(j)
    cnorm2 = sum(v * v for v in c)
    # same arithmetic as _plane_dot but with the centroid literal
    if dialect == "spark":
        arr = "array(" + ", ".join(str(v) for v in c) + ")"
        dot = (
            f"aggregate(sequence(1, {DIM}), 0L, (acc, i) -> acc + "
            f"CAST(FLOOR(CAST(element_at({a}, i) AS DOUBLE) * 100.0) AS BIGINT) * "
            f"element_at({arr}, i))"
        )
    else:
        arr = "[" + ", ".join(str(v) for v in c) + "]"
        dot = (
            f"CAST(list_sum(list_transform(range(1, {DIM} + 1), i -> "
            f"CAST(FLOOR(CAST({a}[i] AS DOUBLE) * 100.0) AS BIGINT) * {arr}[i])) AS BIGINT)"
        )
    return f"({10000 * cnorm2} - 200 * ({dot}))"


def ivf_assign_sql(dialect: str) -> str:
    """IVF coarse quantizer: each vector -> its nearest centroid (exact
    integer distance keys; ties to the smallest centroid id).  The
    centroid id is the inverted-list partition key — at 10^12 scale the
    lists are the table's bucketing, and a probe touches only its list
    (the IVF analog of the LSH bucket equi-join).

    The per-vector |vq|^2 term is added back to every key (computed once
    in the inner subquery) so each key is the true squared distance
    |vq - S*c|^2 >= 0 — without it, an embedding with |v| larger than
    ~1.2 aligned with a centroid yields a negative key and the
    ``LEAST(key*K + j) % K`` argmin encoding returns a negative or wrong
    centroid id in BOTH dialects."""
    vn2 = _qdot(dialect, "embedding", "embedding")
    keys = [
        f"((vn2 + {_centroid_key(dialect, 'embedding', j)}) * {K_CENTROIDS} + {j})"
        for j in range(K_CENTROIDS)
    ]
    least = "LEAST(" + ", ".join(keys) + ")"
    return (
        f"SELECT vec_id, label, CAST(({least}) % {K_CENTROIDS} AS BIGINT) AS centroid "
        f"FROM (SELECT vec_id, label, embedding, {vn2} AS vn2 FROM embeddings) e"
    )


def ivf_topk_sql(dialect: str, n_queries: int = 10, k: int = 5) -> str:
    """IVF ANN top-k (nprobe=1): candidates are the query's own inverted
    list; exact integer-dot re-rank inside it.  Queries whose list holds
    fewer than k neighbors return fewer rows (the classic IVF recall
    trade, bounded work per query)."""
    assign = ivf_assign_sql(dialect)
    dot = _qdot(dialect, "q.embedding", "c.embedding")
    return f"""
    WITH a AS ({assign})
    SELECT query_id, neighbor_id, centroid, dot, rnk
    FROM (
      SELECT qa.vec_id AS query_id, ca.vec_id AS neighbor_id,
             qa.centroid AS centroid, {dot} AS dot,
             ROW_NUMBER() OVER (
               PARTITION BY qa.vec_id
               ORDER BY {dot} DESC, ca.vec_id
             ) AS rnk
      FROM a qa
      JOIN a ca ON ca.centroid = qa.centroid AND ca.vec_id <> qa.vec_id
      JOIN embeddings q ON q.vec_id = qa.vec_id
      JOIN embeddings c ON c.vec_id = ca.vec_id
      WHERE qa.vec_id < {n_queries}
    ) t
    WHERE rnk <= {k}
    """


def ivf_probe2_sql(dialect: str) -> str:
    """IVF probe set, nprobe=2: each vector's 2 nearest centroids — the
    recall knob (probe lists = the buckets a query's candidate join
    touches; nprobe trades recall for join fan-out).  Same non-negative
    true-squared-distance keys as the assignment; the 2nd-best is the
    LEAST over keys excluding the argmin."""
    # compute all K keys as columns once, then rank them
    keys = ", ".join(
        f"(vn2 + {_centroid_key(dialect, 'embedding', j)}) AS key{j}"
        for j in range(K_CENTROIDS)
    )
    vn2_expr = _qdot(dialect, "embedding", "embedding")
    unions = " UNION ALL ".join(
        f"SELECT vec_id, {j} AS centroid, key{j} AS dist_key FROM keyed"
        for j in range(K_CENTROIDS)
    )
    return f"""
    WITH keyed AS (
      SELECT vec_id, embedding, {keys}
      FROM (SELECT vec_id, embedding, {vn2_expr} AS vn2 FROM embeddings) e
    ),
    ranked AS (
      SELECT vec_id, centroid, dist_key,
             ROW_NUMBER() OVER (
               PARTITION BY vec_id ORDER BY dist_key, centroid
             ) AS probe_rank
      FROM ({unions}) u
    )
    SELECT vec_id, CAST(centroid AS BIGINT) AS centroid,
           CAST(dist_key AS BIGINT) AS dist_key,
           CAST(probe_rank AS BIGINT) AS probe_rank
    FROM ranked WHERE probe_rank <= 2
    """


def _explode_dims(dialect: str, from_clause: str) -> str:
    """Dialect-specific dim explosion: append a 1..DIM generator named
    ``r(i)`` to a FROM clause."""
    if dialect == "spark":
        return f"{from_clause} LATERAL VIEW explode(sequence(1, {DIM})) r AS i"
    return f"{from_clause}, range(1, {DIM} + 1) r(i)"


def _qval(dialect: str, a: str) -> str:
    """Quantized (x100) int value of dimension ``i`` of embedding ``a``."""
    if dialect == "spark":
        return (
            f"CAST(FLOOR(CAST(element_at({a}, i) AS DOUBLE) * 100.0) AS BIGINT)"
        )
    return f"CAST(FLOOR(CAST({a}[i] AS DOUBLE) * 100.0) AS BIGINT)"


def ivf_learn_sql(dialect: str) -> str:
    """One Lloyd iteration from the fixed-centroid seed assignment: the
    learned centroid is the per-dimension integer-floored mean of the
    quantized (x100) embeddings in each seed list — exactly the k-means
    update step real IVF builds run, made integer-exact so Spark and
    DuckDB replay it bit-for-bit.

    FLOOR(SUM::DOUBLE / COUNT) is deterministic here: SUM and COUNT are
    exact integers far below 2^53, so the quotient is either exactly
    representable (integral case) or at least 1/COUNT away from the
    nearest integer — double rounding (~1e-16 relative) cannot cross it.

    Learned centroids live at the x100 quantization scale (unlike the
    unit-scale seed centroids), so distance keys downstream need no S
    rescale: |vq - c|^2 = |vq|^2 - 2*dot(vq, c) + |c|^2.

    At 10^12 scale this is one groupBy over (centroid, dim) — a
    512-row aggregate with map-side partials; the learned table is a
    broadcast dimension for the re-assignment pass."""
    assign = ivf_assign_sql(dialect)
    frm = _explode_dims(
        dialect, "FROM a JOIN embeddings e ON e.vec_id = a.vec_id"
    )
    return f"""
    WITH a AS ({assign}),
    dims AS (
      SELECT a.centroid, CAST(i AS BIGINT) AS i,
             {_qval(dialect, 'e.embedding')} AS qval
      {frm}
    )
    SELECT centroid, i,
           CAST(FLOOR(CAST(SUM(qval) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cval
    FROM dims
    GROUP BY centroid, i
    """


def ivf_assign_learned_sql(dialect: str) -> str:
    """IVF coarse quantizer over the LEARNED (one-Lloyd-step) centroids:
    each vector -> its nearest learned centroid by exact integer squared
    distance |vq - c|^2, ties to the smallest centroid id.

    The learned centroids are not compile-time literals, so the dot
    products run as a relational join on the exploded dimension index —
    the centroid side is ~K*DIM rows (a broadcast dimension; AQE picks
    the broadcast plan), the vector side streams.  A seed list left
    empty by the Lloyd step simply drops out of the argmin in both
    dialects (standard k-means dead-centroid behavior)."""
    learn = ivf_learn_sql(dialect)
    frm = _explode_dims(dialect, "FROM embeddings e")
    return f"""
    WITH cent AS ({learn}),
    cnorm AS (
      SELECT centroid, CAST(SUM(cval * cval) AS BIGINT) AS cn2
      FROM cent GROUP BY centroid
    ),
    vdims AS (
      SELECT e.vec_id, CAST(i AS BIGINT) AS i,
             {_qval(dialect, 'e.embedding')} AS qval
      {frm}
    ),
    vnorm AS (
      SELECT vec_id, CAST(SUM(qval * qval) AS BIGINT) AS vn2
      FROM vdims GROUP BY vec_id
    ),
    dots AS (
      SELECT v.vec_id, c.centroid, CAST(SUM(v.qval * c.cval) AS BIGINT) AS dot
      FROM vdims v JOIN cent c ON c.i = v.i
      GROUP BY v.vec_id, c.centroid
    ),
    keyed AS (
      SELECT d.vec_id, d.centroid,
             vn.vn2 - 2 * d.dot + cn.cn2 AS dist,
             ROW_NUMBER() OVER (
               PARTITION BY d.vec_id
               ORDER BY vn.vn2 - 2 * d.dot + cn.cn2, d.centroid
             ) AS rn
      FROM dots d
      JOIN cnorm cn ON cn.centroid = d.centroid
      JOIN vnorm vn ON vn.vec_id = d.vec_id
    )
    SELECT e.vec_id, e.label, k.centroid
    FROM keyed k JOIN embeddings e ON e.vec_id = k.vec_id
    WHERE k.rn = 1
    """


def ivf_topk_learned_sql(dialect: str, n_queries: int = 10, k: int = 5) -> str:
    """IVF ANN top-k (nprobe=1) over the learned-centroid lists: same
    within-list exact integer-dot re-rank as :func:`ivf_topk_sql`, but
    the inverted lists come from the one-Lloyd-step assignment — the
    shape of a production IVF index (trained quantizer, bucketed
    candidate join, exact re-rank bounded to the probed list)."""
    assign = ivf_assign_learned_sql(dialect)
    dot = _qdot(dialect, "q.embedding", "c.embedding")
    return f"""
    WITH la AS ({assign})
    SELECT query_id, neighbor_id, centroid, dot, rnk
    FROM (
      SELECT qa.vec_id AS query_id, ca.vec_id AS neighbor_id,
             qa.centroid AS centroid, {dot} AS dot,
             ROW_NUMBER() OVER (
               PARTITION BY qa.vec_id
               ORDER BY {dot} DESC, ca.vec_id
             ) AS rnk
      FROM la qa
      JOIN la ca ON ca.centroid = qa.centroid AND ca.vec_id <> qa.vec_id
      JOIN embeddings q ON q.vec_id = qa.vec_id
      JOIN embeddings c ON c.vec_id = ca.vec_id
      WHERE qa.vec_id < {n_queries}
    ) t
    WHERE rnk <= {k}
    """


def ivf_topk2_sql(dialect: str, n_queries: int = 10, k: int = 5) -> str:
    """IVF ANN top-k with nprobe=2: candidates come from the query's TWO
    nearest inverted lists (assignment lists of other vectors), exact
    integer re-rank over the union — strictly higher recall than
    nprobe=1 at ~2x the candidate fan-out, the standard IVF scaling
    dial."""
    assign = ivf_assign_sql(dialect)
    probes = ivf_probe2_sql(dialect)
    dot = _qdot(dialect, "q.embedding", "c.embedding")
    return f"""
    WITH a AS ({assign}),
    probes AS ({probes})
    SELECT query_id, neighbor_id, dot, rnk
    FROM (
      SELECT p.vec_id AS query_id, ca.vec_id AS neighbor_id,
             {dot} AS dot,
             ROW_NUMBER() OVER (
               PARTITION BY p.vec_id
               ORDER BY {dot} DESC, ca.vec_id
             ) AS rnk
      FROM probes p
      JOIN a ca ON ca.centroid = p.centroid AND ca.vec_id <> p.vec_id
      JOIN embeddings q ON q.vec_id = p.vec_id
      JOIN embeddings c ON c.vec_id = ca.vec_id
      WHERE p.vec_id < {n_queries}
    ) t
    WHERE rnk <= {k}
    """
