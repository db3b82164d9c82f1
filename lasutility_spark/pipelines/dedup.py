"""Deduplication operators over the ``documents`` table.

- exact:        hash-groupBy on md5(text)
- MinHash LSH:  4-char shingles -> polynomial hash mod 2^31-1 -> k
  permutation minima -> banded buckets -> candidate-pair equi-join
- SimHash:      16-bit token-hash sign aggregate
- n-gram Jaccard: shingle-set intersection/union on candidate pairs

All integer-exact and expressed as portable SQL: shingling/hashing uses
``transform``/``aggregate`` higher-order functions on Spark (JVM,
whole-stage codegen) and ``list_transform``/``list_min`` on DuckDB —
same arithmetic, bit-identical results.  At 10^12 scale the LSH path is
the only shuffle-bounded one: signatures are narrow, the band join is an
equi-join AQE can handle, and candidate verification stays per-pair.
"""

from __future__ import annotations

import os

import pandas as pd

from .text import P31

K_MINHASH = 8  # permutations
BANDS = 4  # 2 rows per band
# fixed affine permutation parameters (a odd, deterministic)
_AS = [(2 * j + 1) * 40503 % P31 for j in range(1, K_MINHASH + 1)]
_BS = [(j * 97 + 13) * 8191 % P31 for j in range(1, K_MINHASH + 1)]


def exact_dedup_sql(dialect: str) -> str:
    """Exact dedup: md5 of full text (same hex in both engines)."""
    return """
    SELECT md5(text) AS content_hash,
           COUNT(*) AS n_copies,
           MIN(doc_id) AS keeper_doc_id
    FROM documents
    GROUP BY md5(text)
    HAVING COUNT(*) >= 1
    """


def _shingle_hashes(dialect: str, text: str = "text") -> str:
    """List of 4-gram polynomial hashes (mod 2^31-1) of ``text``."""
    gram = (
        f"(ascii(substr({text}, i, 1)) * 29791 + ascii(substr({text}, i + 1, 1)) * 961 "
        f"+ ascii(substr({text}, i + 2, 1)) * 31 + ascii(substr({text}, i + 3, 1))) % {P31}"
    )
    if dialect == "spark":
        return f"transform(sequence(1, greatest(length({text}) - 3, 1)), i -> CAST({gram} AS BIGINT))"
    return (
        f"list_transform(range(1, greatest(length({text}) - 3, 1) + 1), "
        f"i -> CAST({gram} AS BIGINT))"
    )


def minhash_signature_sql(dialect: str) -> str:
    """doc_id -> k minhash values (one column per permutation)."""
    sh = _shingle_hashes(dialect)
    if dialect == "spark":
        mins = ",\n      ".join(
            f"array_min(transform(sh, v -> ({a} * v + {b}) % {P31})) AS mh{j}"
            for j, (a, b) in enumerate(zip(_AS, _BS))
        )
    else:
        mins = ",\n      ".join(
            f"list_min(list_transform(sh, v -> ({a} * v + {b}) % {P31})) AS mh{j}"
            for j, (a, b) in enumerate(zip(_AS, _BS))
        )
    return f"""
    SELECT doc_id, {mins}
    FROM (SELECT doc_id, {sh} AS sh FROM documents)
    """


def minhash_bands_sql(dialect: str) -> str:
    """(doc_id, band, band_key) rows — the LSH bucket assignment."""
    sig = minhash_signature_sql(dialect)
    rows_per_band = K_MINHASH // BANDS
    selects = []
    for b in range(BANDS):
        keys = [f"mh{b * rows_per_band + r}" for r in range(rows_per_band)]
        key_expr = " + ".join(
            f"{k} * {P31 if i == 0 else 1}" for i, k in enumerate(keys)
        )
        selects.append(
            f"SELECT doc_id, {b} AS band, CAST({key_expr} AS BIGINT) AS band_key "
            f"FROM sig"
        )
    union = " UNION ALL ".join(selects)
    return f"WITH sig AS ({sig}) {union}"


def minhash_pairs_sql(dialect: str) -> str:
    """LSH candidate pairs: docs sharing any band bucket (distinct)."""
    bands = minhash_bands_sql(dialect)
    return f"""
    WITH bands AS ({bands})
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    """


# --- Spark-side vectorized implementations --------------------------------
#
# Spark's higher-order functions (transform/aggregate) are *interpreted*,
# not codegen'd — at 5k docs x 2.5k shingles x 8 permutations the SQL
# form costs ~50 s.  The Spark engine therefore computes signatures in an
# Arrow-batched numpy UDF with the *identical* integer arithmetic (the
# DuckDB oracle keeps the SQL form), then all joins/explodes stay JVM.


def _shingle_hash_numpy(t: str):
    """Exactly ascii(substr(text,i,1))-based 4-gram polynomial hashes.
    Valid for ASCII corpora (byte == character); falls back to ord() per
    char for non-ASCII."""
    import numpy as np

    raw = t.encode("utf-8")
    if len(raw) == len(t):  # pure ASCII fast path
        b = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
    else:
        b = np.fromiter((ord(c) for c in t), dtype=np.int64, count=len(t))
    b = np.concatenate([b, np.zeros(4, dtype=np.int64)])  # substr past end -> 0
    m = max(len(t) - 3, 1)
    return (
        b[0:m] * 29791 + b[1 : m + 1] * 961 + b[2 : m + 2] * 31 + b[3 : m + 3]
    ) % P31


def minhash_bands_spark(
    spark,
    rows_per_band: int = K_MINHASH // BANDS,
    keep_prior_keys: bool = False,
    keep_sig: bool = False,
):
    """DataFrame twin of minhash_bands_sql: numpy signature UDF + inline
    band explode; output columns (doc_id, band, band_key) match the SQL
    oracle bit-for-bit.  ``keep_prior_keys`` additionally carries
    ``pk1..pk{BANDS-1}`` — the band_keys of the EARLIER bands only
    (NULL for positions at/after the row's own band) — used by the
    min-band pair emission in :func:`minhash_pairs_spark`.  This is the
    slim replacement for carrying the full K-slot ``mh`` signature on
    every band row: the first-colliding-band predicate only ever looks
    at bands BEFORE the row's own, and prior-band collision is keyed on
    band_key equality — the same key the pair-emission join itself uses,
    so suppression is exactly consistent with emission even if band_key
    were not injective in the slots.  Fixed nullable bigint columns beat
    an array<bigint> here: no 24-byte per-row array header through the
    exchange, and the NULL slots are zero bytes after shuffle
    compression.
    ``keep_sig`` carries the full K-slot ``mh`` signature instead — the
    pre-round-5 fat payload, retained ONLY for shuffle-bytes A/B
    benchmarking (see SPARK_GRAFT_Q4_FAT in minhash_pairs_spark)."""
    from pyspark.sql import functions as F

    a_arr = _AS
    b_arr = _BS

    @F.pandas_udf("array<bigint>")
    def sig_udf(text: pd.Series) -> pd.Series:
        import numpy as np

        # all K permutations in ONE broadcasted numpy pass per doc
        # (K x m intermediate; a, sh < 2^31 so a*sh < 2^62 fits int64)
        A = np.asarray(a_arr, dtype=np.int64)[:, None]
        B = np.asarray(b_arr, dtype=np.int64)[:, None]
        out = []
        for t in text:
            sh = _shingle_hash_numpy(t)[None, :]
            out.append(((A * sh + B) % P31).min(axis=1).tolist())
        return pd.Series(out)

    docs = spark.table("documents").select("doc_id", sig_udf("text").alias("mh"))
    keys = []
    for b in range(BANDS):
        i0 = b * rows_per_band
        key = f"element_at(mh, {i0 + 1}) * {P31}"
        for r in range(1, rows_per_band):
            key += f" + element_at(mh, {i0 + r + 1})"
        keys.append(f"CAST({key} AS BIGINT)")
    structs = []
    for b in range(BANDS):
        fields = [f"{b}L AS band", f"{keys[b]} AS band_key"]
        if keep_prior_keys:
            for bp in range(BANDS - 1):
                val = keys[bp] if bp < b else "CAST(NULL AS BIGINT)"
                fields.append(f"{val} AS pk{bp + 1}")
        structs.append(f"struct({', '.join(fields)})")
    cols = ["doc_id", F.expr("inline(array(" + ", ".join(structs) + "))")]
    if keep_sig:
        cols.insert(1, "mh")
    return docs.select(*cols)


def minhash_pairs_spark(spark, rows_per_band: int = K_MINHASH // BANDS):
    # persist the band table: both branches of the bucket self-join read
    # it, and without the cache Spark recomputes the signature UDF twice.
    # At 10^12 scale the signature/band table is MATERIALIZED once (a
    # stored column family / parquet table) and every dedup probe joins
    # against it — persist() is the sandbox analog of that design.
    #
    # Min-band emission: a pair colliding in several bands is kept ONLY
    # in its first colliding band, decided by a codegen'd filter over
    # the carried prior-band keys ("earlier band collided" is band_key
    # equality at that earlier band — the SAME key the emission join
    # uses, so suppression is exactly the dedup of the emitted
    # multiset).  This replaces the global DISTINCT — the only exchange
    # over the candidate-pair set itself — with a narrow per-row
    # predicate; the remaining shuffle is the band equi-join over the
    # (docs x BANDS) table, which is the part that scales, and each
    # band row carries only its EARLIER bands' keys (fixed nullable
    # pk columns) instead of the full K-slot signature.
    # SPARK_GRAFT_Q4_FAT=1 switches back to the pre-round-5 fat payload
    # (full K-slot mh carried per band row, elementwise-mh suppression)
    # for shuffle-bytes A/B benchmarking; outputs are identical.
    fat = os.environ.get("SPARK_GRAFT_Q4_FAT", "0") == "1"
    bands = minhash_bands_spark(
        spark, rows_per_band, keep_prior_keys=not fat, keep_sig=fat
    ).persist()
    a = bands.alias("a")
    b = bands.alias("b")
    from pyspark.sql import functions as F

    if fat:
        first_band = " AND ".join(
            f"(a.band <= {bp} OR NOT ("
            + " AND ".join(
                f"element_at(a.mh, {bp * rows_per_band + r + 1}) = "
                f"element_at(b.mh, {bp * rows_per_band + r + 1})"
                for r in range(rows_per_band)
            )
            + "))"
            for bp in range(BANDS - 1)
        )
    else:
        # pk{bp+1} is non-NULL exactly when band > bp, and a.band ==
        # b.band on joined rows, so the NULL positions are always
        # short-circuited by the band <= bp guard
        first_band = " AND ".join(
            f"(a.band <= {bp} OR a.pk{bp + 1} != b.pk{bp + 1})"
            for bp in range(BANDS - 1)
        )
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .where(F.expr(first_band))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    )


def ngram_jaccard_pairs_spark(spark, threshold_x1000: int = 100):
    """Verify step: distinct-shingle arrays from the numpy UDF, then JVM
    array_intersect/array_union on LSH candidate pairs."""
    from pyspark.sql import functions as F

    @F.pandas_udf("array<bigint>")
    def shingles_udf(text: pd.Series) -> pd.Series:
        import numpy as np

        return pd.Series([np.unique(_shingle_hash_numpy(t)).tolist() for t in text])

    pairs = minhash_pairs_spark(spark)
    sh = spark.table("documents").select(
        "doc_id", shingles_udf("text").alias("s")
    )
    j = (
        pairs.join(sh.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sh.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("sa.s", "sb.s")).cast("long").alias("inter"),
            F.size(F.array_union("sa.s", "sb.s")).cast("long").alias("uni"),
        )
    )
    return j.where(
        (F.col("inter") * 1000.0) / F.col("uni") >= threshold_x1000
    ).select(
        "doc_a",
        "doc_b",
        F.floor((F.col("inter") * 1000.0) / F.col("uni"))
        .cast("long")
        .alias("jaccard_x1000"),
    )


def simhash_sql(dialect: str, bits: int = 16) -> str:
    """Per-doc SimHash over token polynomial hashes: bit b set iff the
    sum of (+1/-1) signs of token-hash bit b is positive."""
    if dialect == "spark":
        gen = "SELECT doc_id, explode(split(text, ' ')) AS tok FROM documents"
    else:
        gen = "SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents"
    # token polynomial hash mod 2^31-1 (portable fold)
    if dialect == "spark":
        th = (
            f"aggregate(sequence(1, length(tok)), 0L, "
            f"(acc, i) -> (acc * 31 + ascii(substr(tok, i, 1))) % {P31})"
        )
    else:
        th = (
            f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
            f"list_transform(range(1, length(tok) + 1), "
            f"i -> CAST(ascii(substr(tok, i, 1)) AS BIGINT))), "
            f"(acc, c) -> (acc * 31 + c) % {P31})"
        )
    # integer bit extraction via FLOOR (CAST of a fractional double rounds
    # in DuckDB but truncates in Spark — never cast non-integral doubles)
    bit_terms = " + ".join(
        f"(CASE WHEN SUM(CASE WHEN CAST(FLOOR(th / {1 << b}) AS BIGINT) % 2 = 1 "
        f"THEN 1 ELSE -1 END) > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(bits)
    )
    return f"""
    SELECT doc_id, CAST({bit_terms} AS BIGINT) AS simhash
    FROM (
      SELECT doc_id, {th} AS th
      FROM ({gen}) WHERE tok <> ''
    )
    GROUP BY doc_id
    """


def ngram_jaccard_pairs_sql(dialect: str, threshold_x1000: int = 100) -> str:
    """n-gram Jaccard similarity on LSH candidate pairs (verify step of
    the dedup pipeline): |A∩B| * 1000 / |A∪B| as exact integer."""
    pairs = minhash_pairs_sql(dialect)
    sh = _shingle_hashes(dialect)
    if dialect == "spark":
        setop = (
            "CAST(size(array_intersect(a.s, b.s)) AS BIGINT) AS inter, "
            "CAST(size(array_union(a.s, b.s)) AS BIGINT) AS uni"
        )
        dedup_list = "array_distinct"
    else:
        setop = (
            "CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS inter, "
            "CAST(len(list_distinct(list_concat(a.s, b.s))) AS BIGINT) AS uni"
        )
        dedup_list = "list_distinct"
    return f"""
    WITH pairs AS ({pairs}),
    shingles AS (SELECT doc_id, {dedup_list}({sh}) AS s FROM documents)
    SELECT doc_a, doc_b,
           CAST(FLOOR((inter * 1000.0) / uni) AS BIGINT) AS jaccard_x1000
    FROM (
      SELECT p.doc_a, p.doc_b, {setop}
      FROM pairs p
      JOIN shingles a ON a.doc_id = p.doc_a
      JOIN shingles b ON b.doc_id = p.doc_b
    ) t
    WHERE (inter * 1000.0) / uni >= {threshold_x1000}
    """


def components_spark(spark, max_iters: int = 32, stats: dict | None = None,
                     truncate_every: int = 8):
    """Near-duplicate CLUSTERS: connected components over the LSH
    candidate-pair graph via iterative min-label propagation — the
    Pregel/BSP shape (each superstep: neighbor-min join + label update,
    terminate when no label changes).  This is the dedup endgame: pair
    lists become cluster ids, and "keep the min doc_id per cluster" is
    then one groupBy.

    Scale notes: each superstep is two shuffles on (doc_id); supersteps
    are bounded by the cluster diameter (near-dup clusters are shallow).
    The convergence check is FOLDED into the superstep: the label update
    carries a per-row ``chg`` flag and ONE aggregate job both
    materializes the new label cache and returns the changed-count —
    there is no separate old-vs-new join + count job per iteration
    (at 10^12 edges that second job per superstep doubles the job
    count for pure control flow).  Labels persist per iteration and the
    previous iteration unpersists; every ``truncate_every`` supersteps
    the labels are LAZILY localCheckpoint'ed instead (materialized by
    the same aggregate job, so still one action per superstep), which
    truncates the growing lineage chain — without it a deep graph's
    plan re-nests every prior superstep.  The driver-side loop is
    control flow only — per-row data never leaves the cluster.

    ``stats`` (optional dict) receives ``{"supersteps": k}`` so tests
    can bound the per-superstep job count via the status tracker.

    Oracle: the same components as a DuckDB RECURSIVE CTE (transitive
    closure + MIN) — see :func:`components_sql`.
    """
    from pyspark.sql import functions as F

    pairs = minhash_pairs_spark(spark)
    edges = pairs.selectExpr("doc_a AS src", "doc_b AS dst").union(
        pairs.selectExpr("doc_b AS src", "doc_a AS dst")
    ).persist()
    labels = (
        spark.table("documents").selectExpr("doc_id", "doc_id AS comp").persist()
    )
    try:
        labels.count()
        for it in range(max_iters):
            nbr = (
                edges.join(labels, edges.src == labels.doc_id)
                .groupBy("dst")
                .agg(F.min("comp").alias("nbr_comp"))
            )
            new_comp = F.least(
                F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))
            )
            new_labels = labels.join(nbr, labels.doc_id == nbr.dst, "left").select(
                labels.doc_id,
                new_comp.alias("comp"),
                (new_comp < F.col("comp")).cast("int").alias("chg"),
            )
            if truncate_every and (it + 1) % truncate_every == 0:
                # lineage truncation: lazy local checkpoint, materialized
                # by the same aggregate job below (still one action)
                new_labels = new_labels.localCheckpoint(eager=False)
            else:
                new_labels = new_labels.persist()
            # one job: materializes the cache AND returns the changed-count
            # "or 0": F.sum over ZERO rows is NULL/None (empty documents
            # table), which must terminate, not spin to max_iters
            changed = new_labels.agg(F.sum("chg")).collect()[0][0] or 0
            labels.unpersist()
            labels = new_labels
            if stats is not None:
                stats["supersteps"] = it + 1
            if changed == 0:
                break
        else:
            raise RuntimeError("components did not converge")
    except BaseException:
        # don't leak cached partitions for the session on non-convergence
        # or any mid-superstep failure (the result path unpersists edges
        # below; labels stays persisted only as the returned result)
        labels.unpersist()
        edges.unpersist()
        raise
    edges.unpersist()
    return labels.selectExpr("doc_id", "CAST(comp AS BIGINT) AS comp")


def keep_one_spark(spark):
    """Corpus dedup endgame: collapse each near-dup component to its
    surviving representative.  The component label is already the MIN
    reachable doc_id, so the survivor IS the component id; the output
    is the cleaned-corpus manifest — one row per kept document with its
    group size and how many near-dups it absorbed.  At scale this is
    one map-side-combinable groupBy over the component labels."""
    from pyspark.sql import functions as F

    return (
        components_spark(spark)
        .groupBy(F.col("comp").alias("kept_doc"))
        .agg(
            F.count("*").alias("group_size"),
            (F.count("*") - F.lit(1)).alias("n_dropped"),
        )
    )


def keep_one_sql(dialect: str) -> str:
    """Oracle for :func:`keep_one_spark`: same collapse over the
    RECURSIVE-CTE component labels."""
    comp = components_sql(dialect)
    return f"""
    WITH c AS ({comp})
    SELECT comp AS kept_doc, COUNT(*) AS group_size,
           COUNT(*) - 1 AS n_dropped
    FROM c GROUP BY comp
    """


def components_sql(dialect: str) -> str:
    """DuckDB oracle for :func:`components_spark`: transitive closure of
    the candidate-pair graph as a RECURSIVE CTE, component id = MIN
    reachable doc_id.  (Spark SQL has no recursive CTE — the DataFrame
    loop above is the Spark-native expression of the same fixpoint.)"""
    pairs = minhash_pairs_sql(dialect)
    return f"""
    WITH RECURSIVE
    pairs AS ({pairs}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    reach(doc, r) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.doc
    )
    SELECT doc AS doc_id, CAST(MIN(r) AS BIGINT) AS comp
    FROM reach GROUP BY doc
    """
