"""Similarity search over embedding columns (array<float>).

Two paths, as a large-scale pipeline needs both:

- :func:`cosine_topk_bruteforce` — exact top-k against a SMALL query
  set. The query side is broadcast, so the plan is a broadcast
  nested-loop over the candidate scan: one pass, no shuffle of the
  big side. Correct baseline; cost O(n_candidates × n_queries).
- :func:`cosine_topk_lsh` — random-hyperplane LSH: candidates and
  queries are bucketed by a P-bit sign code, the join is an equi-join
  on the bucket code, and ranking happens within buckets only. This
  is the 100 TB path: the big side shuffles once on a scalar key, and
  no pair outside a shared bucket is ever scored.

Dot products use ``F.zip_with`` + ``F.aggregate`` over
``array<double>`` — JVM-side, no Python/Pandas round-trip. The
hyperplanes are deterministic (numpy PCG64 seed 42) so results are
reproducible across runs and sessions.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from parquet_combiner_spark.operators.topk import top_k_per_group

DEFAULT_PLANES = 12


def dot(a: Column, b: Column) -> Column:
    """Elementwise dot product of two array<double> columns
    (left-to-right fold — matches DuckDB's list_dot_product order, so
    oracle comparisons are bit-identical)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL (not an ANSI DIVIDE_BY_ZERO crash) when
    either vector is all-zero — a padding/null-embedding row at corpus
    scale must degrade, never kill the job. DuckDB's double division
    by zero yields NULL too, so oracle parity is preserved."""
    denom = norm(a) * norm(b)
    return F.when(denom > 0, dot(a, b) / denom)


def _as_double(df: DataFrame, vec_col: str) -> DataFrame:
    return df.withColumn(vec_col, F.col(vec_col).cast("array<double>"))


def _vector_dim(df: DataFrame, vec_col: str) -> int:
    """Embedding dimensionality, read from the data (one-row scan).

    Hyperplane arrays MUST match the vector length: ``zip_with``
    null-pads a mismatch, the dot product folds to NULL, every sign
    test fails, and all vectors silently land in LSH bucket 0 — a
    hidden O(n²) pair expansion instead of an error."""
    row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if row is None or row["d"] is None or row["d"] <= 0:
        raise ValueError(
            f"cannot infer embedding dim from column {vec_col!r} "
            "(empty DataFrame or null/empty vectors)"
        )
    return int(row["d"])


def cosine_topk_bruteforce(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "q_id",
) -> DataFrame:
    """Exact cosine top-k of each query against all candidates.

    ``queries`` must be small (it is broadcast); candidates stream
    through in one scan. Output: (q_id, n_id, sim, rank) with a total
    tiebreak (sim desc, n_id asc).

    Plan shape: each side's norm is computed ONCE per row before the
    broadcast nested-loop — not per pair, which would redo the
    candidate norm n_queries times (measured ~2x at sf0.1). The
    norm factorization is bit-identical to the generic
    :func:`cosine`, so the DuckDB oracle still hash-matches. (An
    unrolled flat-expression dot was tried and measured SLOWER: a
    64-term element_at chain overflows codegen method limits and
    falls back to full interpretation.)
    """
    cand = _as_double(candidates, vec_col).select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("n_emb"),
        norm(F.col(vec_col)).alias("__n_norm"),
    )
    qry = _as_double(queries, vec_col).select(
        F.col(query_id_col if query_id_col in queries.columns else id_col).alias(
            "q_id"
        ),
        F.col(vec_col).alias("q_emb"),
        norm(F.col(vec_col)).alias("__q_norm"),
    )
    pairs = cand.crossJoin(F.broadcast(qry)).where(
        F.col("n_id") != F.col("q_id")
    )
    denom = F.col("__q_norm") * F.col("__n_norm")
    scored = pairs.select(
        "q_id",
        "n_id",
        # when-guarded like cosine(): zero vectors degrade to NULL
        # instead of an ANSI DIVIDE_BY_ZERO job failure
        F.when(
            denom > 0, dot(F.col("q_emb"), F.col("n_emb")) / denom
        ).alias("__cos"),
    )
    ranked = top_k_per_group(
        scored, ["q_id"], [F.desc("__cos"), F.asc("n_id")], k, rank_col="rank"
    )
    return ranked.select(
        "q_id", "n_id", F.round("__cos", 6).alias("sim"), "rank"
    )


def cosine_topk_pandas(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k via Arrow-batched numpy — the high-throughput
    variant of :func:`cosine_topk_bruteforce` for wide embeddings.

    The (small) query set is collected to a numpy matrix and shipped
    in the closure; each Arrow batch of candidates becomes one
    C-speed matmul (batch x dim @ dim x queries) followed by a
    per-batch partial top-k, so only ``batches x queries x k``
    candidate rows reach the final exact rank — the same
    partial-then-final shape as a Spark aggregation, with the inner
    loop vectorized instead of interpreted per element.
    """
    import numpy as np
    import pandas as pd

    q_rows = (
        _as_double(queries, vec_col)
        .select(F.col(id_col), F.col(vec_col))
        .collect()
    )
    if not q_rows:
        # empty query set: pd.concat([]) inside the executor would
        # raise; short-circuit with an empty frame of the output shape
        return candidates.sparkSession.createDataFrame(
            [], schema="q_id long, n_id long, sim double, rank int"
        )
    q_ids = np.array([r[0] for r in q_rows])
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)
    q_norm = np.linalg.norm(q_mat, axis=1)

    out_schema = (
        f"q_id long, n_id long, sim double"
    )

    def score(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            sims = (mat @ q_mat.T) / (
                np.linalg.norm(mat, axis=1)[:, None] * q_norm[None, :]
            )
            frames = []
            for qi in range(len(q_ids)):
                col = sims[:, qi]
                mask = ids != q_ids[qi]
                cids, csims = ids[mask], col[mask]
                if len(cids) > k:  # partial top-k per batch
                    # lexsort, not argpartition: ties at the k-th
                    # boundary must resolve by n_id asc, or the final
                    # exact rank never sees the survivor the total
                    # (sim desc, n_id asc) order would keep
                    keep = np.lexsort((cids, -csims))[:k]
                    cids, csims = cids[keep], csims[keep]
                frames.append(
                    pd.DataFrame(
                        {"q_id": q_ids[qi], "n_id": cids, "sim": csims}
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    partial = _as_double(candidates, vec_col).select(
        F.col(id_col), F.col(vec_col)
    ).mapInPandas(score, schema=out_schema)
    ranked = top_k_per_group(
        partial, ["q_id"], [F.desc("sim"), F.asc("n_id")], k, rank_col="rank"
    )
    return ranked.select("q_id", "n_id", F.round("sim", 6).alias("sim"), "rank")


def hyperplanes(dim: int, num_planes: int = DEFAULT_PLANES, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes for sign-LSH."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((num_planes, dim)).tolist()


def lsh_code(vec: Column, planes: list[list[float]]) -> Column:
    """P-bit sign code of ``vec`` against ``planes`` (long). Two
    vectors with small angle share codes with high probability."""
    code = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        plane_col = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(
            dot(vec, plane_col) > 0,
            F.shiftleft(F.lit(1).cast("long"), p),
        ).otherwise(F.lit(0).cast("long"))
        code = code.bitwiseOR(bit)
    return code


def cosine_topk_lsh(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int | None = None,
    num_planes: int = DEFAULT_PLANES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: list[list[float]] | None = None,
) -> DataFrame:
    """Approximate cosine top-k: score only candidates sharing the
    query's LSH bucket. Output: (q_id, n_id, sim, rank) — a subset of
    the brute-force result (recall < 1 by design, controlled by
    ``num_planes``; fewer planes → bigger buckets → higher recall).
    ``dim`` defaults to the actual vector length (see
    :func:`_vector_dim` for why a mismatch must not pass silently).
    ``planes`` overrides generation — pass
    :func:`load_lsh_planes`'s result so serving uses the COMMITTED
    hash geometry (any plane change silently re-buckets everything;
    the versioned table is what makes that an explicit event).
    """
    if planes is None:
        planes = hyperplanes(
            dim or _vector_dim(candidates, vec_col), num_planes
        )
    cand = _as_double(candidates, vec_col).select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("n_emb"),
        lsh_code(F.col(vec_col), planes).alias("code"),
    )
    qry = _as_double(queries, vec_col).select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_emb"),
        lsh_code(F.col(vec_col), planes).alias("code"),
    )
    pairs = cand.join(F.broadcast(qry), on="code").where(
        F.col("n_id") != F.col("q_id")
    )
    scored = pairs.select(
        "q_id", "n_id", cosine(F.col("q_emb"), F.col("n_emb")).alias("__cos")
    )
    ranked = top_k_per_group(
        scored, ["q_id"], [F.desc("__cos"), F.asc("n_id")], k, rank_col="rank"
    )
    return ranked.select(
        "q_id", "n_id", F.round("__cos", 6).alias("sim"), "rank"
    )


def _pair_cosine_arrow(
    pairs_with_vecs: DataFrame,
    a_col: str = "emb_a",
    b_col: str = "emb_b",
) -> DataFrame:
    """(id_a, id_b, cos) for candidate pairs carrying both vectors —
    one Arrow/numpy pass instead of three interpreted aggregate-lambda
    folds (dot + two norms) per pair. Accumulates sequentially over
    the dimension axis so every dot/norm reproduces the JVM/DuckDB
    left-to-right fold bit-for-bit (same IEEE-754 op sequence).

    Ids pass through untouched (pandas → pandas) and the output
    schema carries the INPUT id type — string/int32 id columns work
    the same as longs."""
    import numpy as np
    import pandas as pd

    schema = T.StructType(
        [
            T.StructField("id_a", pairs_with_vecs.schema["id_a"].dataType),
            T.StructField("id_b", pairs_with_vecs.schema["id_b"].dataType),
            T.StructField("cos", T.DoubleType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            a = np.asarray(pdf[a_col].tolist(), dtype=np.float64)
            b = np.asarray(pdf[b_col].tolist(), dtype=np.float64)
            dot = np.zeros(len(pdf), dtype=np.float64)
            na = np.zeros(len(pdf), dtype=np.float64)
            nb = np.zeros(len(pdf), dtype=np.float64)
            for j in range(a.shape[1]):  # sequential over dim: fold order
                dot += a[:, j] * b[:, j]
                na += a[:, j] * a[:, j]
                nb += b[:, j] * b[:, j]
            yield pd.DataFrame(
                {
                    "id_a": pdf["id_a"],
                    "id_b": pdf["id_b"],
                    "cos": dot / (np.sqrt(na) * np.sqrt(nb)),
                }
            )

    return pairs_with_vecs.select("id_a", "id_b", a_col, b_col).mapInPandas(
        run, schema=schema
    )


def _lsh_codes_arrow(
    e: DataFrame,
    id_col: str,
    vec_col: str,
    tables: list[tuple[int, list[list[float]]]],
    num_planes: int,
) -> DataFrame:
    """(vid, tbl, code): every table's sign code per vector in ONE
    Arrow/numpy pass. The JVM formulation evaluated num_tables *
    num_planes interpreted ``aggregate``-lambda dot products per row
    (~60 per vector for the registry knobs — measured 10s at sf0.1
    where this pass takes well under 1s).

    Bit-exactness contract: the SQL oracles reproduce codes with
    DuckDB's left-to-right ``list_dot_product`` fold, so the
    accumulation here iterates the DIMENSION axis sequentially
    (vectorized across rows × planes) — the identical IEEE-754
    multiply/add sequence per (vector, plane) as the JVM fold, not a
    pairwise/BLAS-reassociated matmul whose near-zero dots could flip
    a sign bit.

    Ids pass through untouched (``numpy.repeat`` handles object
    dtypes) and ``vid`` carries the INPUT id column's type."""
    import numpy as np
    import pandas as pd

    plane_mat = np.asarray(
        [p for _, planes in tables for p in planes], dtype=np.float64
    )  # (num_tables * num_planes, dim)
    tbl_ids = np.asarray([t for t, _ in tables], dtype=np.int64)
    n_tables = len(tables)

    schema = T.StructType(
        [
            T.StructField("vid", e.schema[id_col].dataType),
            T.StructField("tbl", T.IntegerType()),
            T.StructField("code", T.LongType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            acc = np.zeros((len(pdf), plane_mat.shape[0]), dtype=np.float64)
            for j in range(v.shape[1]):  # sequential over dim: fold order
                acc += v[:, j : j + 1] * plane_mat[:, j]
            pos = acc > 0.0
            codes = np.zeros((len(pdf), n_tables), dtype=np.int64)
            for t in range(n_tables):
                for p in range(num_planes):
                    codes[:, t] |= (
                        pos[:, t * num_planes + p].astype(np.int64) << p
                    )
            vids = pdf[id_col].to_numpy()
            yield pd.DataFrame(
                {
                    "vid": np.repeat(vids, n_tables),
                    "tbl": pd.Series(
                        np.tile(tbl_ids, len(pdf)), dtype="int32"
                    ),
                    "code": codes.reshape(-1),
                }
            )

    return e.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        run, schema=schema
    )


DENSITY_WARN = 0.25  # candidate pairs / all pairs; above this the
# LSH bucketing is not pruning and the plan degenerates toward O(n²)


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    min_cosine: float = 0.95,
    dim: int | None = None,
    num_planes: int = DEFAULT_PLANES,
    num_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    density_warn: float | None = DENSITY_WARN,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via multi-table LSH
    self-join: (id_a, id_b, sim) with sim ≥ ``min_cosine``, id_a <
    id_b.

    OR-amplification across ``num_tables`` independent hyperplane
    sets: a pair is a candidate if it collides in ANY table, lifting
    recall from p^planes to 1-(1-p^planes)^tables while each table's
    join stays an equi-join on (table, code) — never a cross join.
    Candidate ids are deduped BEFORE scoring so each pair's cosine is
    computed once, and the id-pair shuffle carries no vectors.

    Density guard (no silent caps): the whole 100×-scale argument
    rests on bucket SPARSITY — when knobs/data make buckets dense the
    candidate set approaches all-pairs and the "LSH" is a cross join
    wearing an equi-join's plan. The candidate set is therefore
    materialized (eager localCheckpoint, the minhash pattern — it is
    id pairs only, and scoring reuses the blocks instead of re-running
    the self-join) and its density vs n·(n−1)/2 measured; above
    ``density_warn`` a RuntimeWarning names the knobs. Pass
    ``density_warn=None`` to skip the count when the caller owns the
    tradeoff."""
    import warnings

    dim = dim or _vector_dim(embeddings, vec_col)
    tables = [
        (t, hyperplanes(dim, num_planes, seed=42 + t))
        for t in range(num_tables)
    ]
    e = _as_double(embeddings, vec_col)
    coded = _lsh_codes_arrow(e, id_col, vec_col, tables, num_planes)
    a = coded.alias("a")
    b = coded.alias("b")
    cand = (
        a.join(
            b,
            on=[
                F.col("a.tbl") == F.col("b.tbl"),
                F.col("a.code") == F.col("b.code"),
                F.col("a.vid") < F.col("b.vid"),
            ],
        )
        .select(
            F.col("a.vid").alias("id_a"), F.col("b.vid").alias("id_b")
        )
        .distinct()
    )
    if density_warn is not None:
        cand = cand.localCheckpoint(eager=True)
        n = embeddings.count()
        n_cand = cand.count()
        total = n * (n - 1) // 2
        density = n_cand / total if total else 0.0
        if density > density_warn:
            warnings.warn(
                f"embedding LSH candidate density {density:.3f} "
                f"({n_cand}/{total} pairs) exceeds {density_warn} at "
                f"num_planes={num_planes}, num_tables={num_tables}: "
                "the bucketing is not pruning (near-all-pairs scoring); "
                "raise num_planes or revisit min_cosine",
                RuntimeWarning,
                stacklevel=2,
            )
    emb_a = e.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("emb_a"))
    emb_b = e.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("emb_b"))
    # Arrow-batched scoring: when knobs/data make buckets dense the
    # candidate set approaches all-pairs (652k pairs at sf0.1 with the
    # registry knobs), and a per-pair interpreted cosine lambda
    # dominates the query; the numpy pass keeps the JVM fold's exact
    # accumulation order (see _pair_cosine_arrow), so the oracle's
    # round-6 values still hash-match bit-for-bit.
    scored = _pair_cosine_arrow(
        cand.join(emb_a, "id_a").join(emb_b, "id_b")
    )
    return scored.where(F.col("cos") >= min_cosine).select(
        "id_a", "id_b", F.round(F.col("cos"), 6).alias("sim")
    )


def train_ivf_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    sample: int = 2048,
    iters: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Train the IVF coarse quantizer: Lloyd k-means on a
    deterministic sample (lowest ids), driver-side numpy.

    Sampling is the standard practice at scale — FAISS trains IVF on
    ~(30-256)·k vectors regardless of corpus size — so collecting a
    bounded sample to the driver is the intended design, not a
    shortcut; assignment of the full corpus stays distributed."""
    import numpy as np

    rows = (
        _as_double(embeddings, vec_col)
        .select(vec_col)
        .orderBy(id_col)
        .limit(sample)
        .collect()
    )
    x = np.array([r[0] for r in rows], dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        sims = x @ cents.T
        assign = sims.argmax(axis=1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cents[c] = m / max(np.linalg.norm(m), 1e-12)
    return cents.tolist()


def _ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    nprobe: int,
    id_alias: str,
    emb_alias: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, emb, centroid_id) with each vector assigned to its
    ``nprobe`` nearest centroids (1 for candidates, >1 for queries).
    numpy matmul per Arrow batch — the same vectorized scale path as
    cosine_topk_pandas."""
    import numpy as np
    import pandas as pd

    c_mat = np.array(centroids, dtype=np.float64)

    schema = f"{id_alias} long, {emb_alias} array<double>, centroid_id int"

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            mat_n = mat / np.maximum(
                np.linalg.norm(mat, axis=1, keepdims=True), 1e-12
            )
            sims = mat_n @ c_mat.T
            top = np.argsort(-sims, axis=1)[:, :nprobe]
            yield pd.DataFrame(
                {
                    id_alias: pdf[id_col].to_numpy().repeat(nprobe),
                    emb_alias: [
                        list(v) for v in mat for _ in range(nprobe)
                    ],
                    "centroid_id": top.reshape(-1).astype("int32"),
                }
            )

    return _as_double(df, vec_col).select(id_col, vec_col).mapInPandas(
        assign, schema=schema
    )


def persist_ivf_centroids(
    embeddings: DataFrame,
    table: str,
    n_centroids: int = 16,
    sample: int = 2048,
    iters: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Train the IVF coarse quantizer ONCE and commit it to a txlog
    versioned table — the production posture: retraining k-means per
    query invocation (what :func:`cosine_topk_ivf` does by default
    for self-containedness) re-pays the training sample collect and,
    worse, lets two invocations disagree about cell geometry. A
    committed quantizer is shared, versioned (re-trains append a new
    version; readers pin one), and time-travelable alongside the data
    it indexes. Returns the committed version.

    One row per centroid (centroid_id, centroid) — metadata-sized, so
    loading is a bounded collect."""
    from parquet_combiner_spark.tools import txlog

    cents = train_ivf_centroids(
        embeddings, n_centroids, sample=sample, iters=iters, seed=seed,
        id_col=id_col, vec_col=vec_col,
    )
    df = embeddings.sparkSession.createDataFrame(
        [(i, list(c)) for i, c in enumerate(cents)],
        "centroid_id int, centroid array<double>",
    )
    return txlog.commit(
        df,
        table,
        action="overwrite",
        meta={"n_centroids": len(cents), "sample": sample, "seed": seed},
    )


def persist_lsh_planes(
    spark,
    table: str,
    dim: int,
    num_planes: int = DEFAULT_PLANES,
    seed: int = 42,
) -> int:
    """Commit the sign-LSH hyperplanes to a txlog versioned table —
    the companion of :func:`persist_ivf_centroids`, so the ENTIRE ANN
    serving state (coarse quantizer + hash geometry) is versioned:
    planes decide bucket membership, so changing them invisibly
    re-buckets every vector; committing them makes a re-hash an
    explicit, time-travelable event readers pin a version of. One row
    per plane (plane_id, plane) — metadata-sized. Returns the
    committed version."""
    from parquet_combiner_spark.tools import txlog

    planes = hyperplanes(dim, num_planes, seed)
    df = spark.createDataFrame(
        [(i, list(p)) for i, p in enumerate(planes)],
        "plane_id int, plane array<double>",
    )
    return txlog.commit(
        df,
        table,
        action="overwrite",
        meta={"dim": dim, "num_planes": num_planes, "seed": seed},
    )


def load_lsh_planes(
    spark, table: str, version: int | None = None
) -> list[list[float]]:
    """Load committed hyperplanes (latest or a pinned version) in
    plane_id order — the ``planes=`` input to :func:`cosine_topk_lsh`
    / :func:`lsh_code`."""
    from parquet_combiner_spark.tools import txlog

    rows = (
        txlog.read_table(spark, table, version)
        .orderBy("plane_id")
        .collect()
    )
    if not rows:
        raise ValueError(f"{table} holds no hyperplanes")
    return [list(r["plane"]) for r in rows]


def load_ivf_centroids(
    spark, table: str, version: int | None = None
) -> list[list[float]]:
    """Load a committed quantizer (latest or a pinned version) in
    centroid_id order — the ``centroids=`` input to
    :func:`cosine_topk_ivf`."""
    from parquet_combiner_spark.tools import txlog

    rows = (
        txlog.read_table(spark, table, version)
        .orderBy("centroid_id")
        .collect()
    )
    if not rows:
        raise ValueError(f"{table} holds no centroids")
    return [list(r["centroid"]) for r in rows]


def cosine_topk_ivf(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF approximate top-k: candidates are partitioned into
    ``n_centroids`` Voronoi cells (one cell each); each query probes
    its ``nprobe`` nearest cells; scoring is an equi-join on
    centroid_id — the big side shuffles once on a small int key and
    only ~nprobe/n_centroids of the corpus is scored per query.
    Output: (q_id, n_id, sim, rank), a subset of the brute-force
    result with recall controlled by ``nprobe``.

    ``centroids`` (e.g. from :func:`load_ivf_centroids`) skips the
    in-query k-means — the train-once scale path; ``n_centroids`` is
    then ignored in favor of the given quantizer."""
    cents = centroids if centroids is not None else train_ivf_centroids(
        candidates, n_centroids, id_col=id_col, vec_col=vec_col
    )
    cand = _ivf_assign(candidates, cents, 1, "n_id", "n_emb", id_col, vec_col)
    qry = _ivf_assign(queries, cents, nprobe, "q_id", "q_emb", id_col, vec_col)
    pairs = cand.join(F.broadcast(qry), on="centroid_id").where(
        F.col("n_id") != F.col("q_id")
    )
    scored = pairs.select(
        "q_id", "n_id", cosine(F.col("q_emb"), F.col("n_emb")).alias("__cos")
    )
    ranked = top_k_per_group(
        scored, ["q_id"], [F.desc("__cos"), F.asc("n_id")], k, rank_col="rank"
    )
    return ranked.select(
        "q_id", "n_id", F.round("__cos", 6).alias("sim"), "rank"
    )


def embedding_dim_stats(
    embeddings: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Per-dimension (coordinate) statistics over a vector column:
    (dim, n, mean, std) — the fit half of feature standardization
    (z-scoring), and the first diagnostic for dead or exploding
    embedding dimensions.

    Scale shape: ``posexplode`` is a NARROW per-row expansion (one
    row per coordinate, no shuffle) feeding a partial-aggregated
    groupBy with exactly ``dim`` groups — map-side combine collapses
    each partition to ``dim`` rows before the one exchange, so the
    shuffle is O(partitions × dims) regardless of corpus size. The
    returned frame is dimension-sized: broadcast it back to apply the
    standardization."""
    e = _as_double(embeddings, vec_col)
    return (
        e.select(F.posexplode(vec_col).alias("dim", "v"))
        .groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("v"), 4).alias("mean"),
            F.round(F.stddev("v"), 4).alias("std"),
        )
    )


def embedding_label_stats(embeddings: DataFrame) -> DataFrame:
    """Per-label embedding statistics: (label, n, avg_norm) — a sanity
    aggregation over the vector column, JVM-side."""
    e = _as_double(embeddings, "embedding")
    return e.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(norm(F.col("embedding"))), 4).alias("avg_norm"),
    )


def semdedup(
    embeddings: DataFrame,
    n_centroids: int = 16,
    min_cosine: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample: int = 2048,
    seed: int = 42,
    centroids: list | None = None,
) -> DataFrame:
    """SemDedup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by k-means partitioning + within-cluster cosine —
    the embedding-space analog of the MinHash pipeline, and the
    standard way to prune paraphrase-level duplicates a lexical
    dedup cannot see.

    Composition of the engine's existing parts: the IVF coarse
    quantizer (:func:`train_ivf_centroids` — bounded driver sample,
    seeded, deterministic) partitions the corpus; candidate pairs are
    generated ONLY within a centroid's member set (the paper's trick
    — cosine-similar vectors share a nearest centroid, so the
    quadratic blowup is bounded by cluster size, never corpus size);
    pairs at ``cos >= min_cosine`` feed the same min-label
    connected-components + keeper decision the text near-dup families
    use (dedup_text.near_dup_clusters). At 100 TB, scale
    ``n_centroids`` ∝ corpus/target-cluster-size: assignment is one
    Arrow matmul pass, the self-join shuffles each vector once on
    centroid_id, and per-cluster work is quadratic only in the
    cluster.

    Like the paper, recall is bounded by the partitioning: a dup pair
    split across two centroids is missed (the price of never going
    quadratic in the corpus). nprobe>1 assignment would trade cost
    for recall; the planted-dup pytest pins the recall this
    configuration must deliver.

    Output: one row per input vector —
    (``id_col``, centroid_id, dup_group, keep), where dup_group is
    the minimum reachable id (singletons: their own id) and exactly
    the minimum id of each dup group carries ``keep = true``.

    ``centroids`` (optional) supplies a FIXED quantizer instead of
    training one — the assignment is then a pure deterministic
    function of (vector, literals), which is what lets the
    ``embedding_semdedup_fixed`` registry twin sit under the DuckDB
    hash gate (the oracle embeds the same centroid literals; k-means
    training itself is driver-resident numpy and stays rows-only).
    Production uses the trained path; the fixed path is also the
    pinned-geometry deployment shape (persist_ivf_centroids → serve).
    """
    from parquet_combiner_spark.functions.dedup_text import (
        dedup_keepers,
        near_dup_clusters,
    )

    cents = centroids if centroids is not None else train_ivf_centroids(
        embeddings,
        n_centroids=n_centroids,
        sample=sample,
        seed=seed,
        id_col=id_col,
        vec_col=vec_col,
    )
    assigned = _ivf_assign(
        embeddings, cents, 1, "vid", "emb", id_col=id_col, vec_col=vec_col
    ).localCheckpoint(eager=True)  # one assignment pass feeds both join sides
    a, b = assigned.alias("a"), assigned.alias("b")
    pairs = a.join(
        b,
        on=[
            F.col("a.centroid_id") == F.col("b.centroid_id"),
            F.col("a.vid") < F.col("b.vid"),
        ],
    ).select(
        F.col("a.vid").alias("id_a"),
        F.col("b.vid").alias("id_b"),
        F.col("a.emb").alias("emb_a"),
        F.col("b.emb").alias("emb_b"),
    )
    dup_pairs = _pair_cosine_arrow(pairs).where(F.col("cos") >= min_cosine)
    verdicts = dedup_keepers(
        near_dup_clusters(dup_pairs, id_a="id_a", id_b="id_b")
    )
    return (
        assigned.select(F.col("vid").alias(id_col), "centroid_id")
        .join(
            verdicts.select(
                F.col("doc_id").alias(id_col),
                F.col("cluster_id").alias("dup_group"),
                "keep",
            ),
            id_col,
            "left",
        )
        .select(
            id_col,
            "centroid_id",
            F.coalesce("dup_group", F.col(id_col)).alias("dup_group"),
            F.coalesce("keep", F.lit(True)).alias("keep"),
        )
    )


def quantize_embeddings(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector int8 quantization — the storage-scale
    move for embedding corpora: 100 TB of float32 vectors become
    ~25 TB of int8 plus one float scale per vector, and int8 dot
    products are what every serious ANN runtime executes anyway.

    scale = max|v| / 127; q_i = round(v_i / scale) ∈ [-127, 127].
    Reconstruction error is bounded by scale/2 per component (pinned
    by pytest). Pure narrow projection; the per-element lambdas are
    interpreted, but at D≈64 the per-row cost is trivial and nothing
    shuffles. Output: (id, scale double, qvec array<int>).
    """
    e = _as_double(embeddings, vec_col)
    v = F.col(vec_col)
    scale = F.greatest(
        F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(127.0),
        F.lit(1e-30),  # zero vectors quantize to zeros, not NaN
    )
    # floor(y + 0.5), not round(y): round()'s half-way tie handling is
    # engine-dependent (HALF_UP vs the C library's rint), and a single
    # divergent tie moves that component's error by a full scale step;
    # add-then-floor is plain IEEE arithmetic, bit-identical everywhere
    return e.withColumn("scale", scale).select(
        id_col,
        "scale",
        F.transform(
            v,
            lambda x: F.floor(x / F.col("scale") + F.lit(0.5)).cast("int"),
        ).alias("qvec"),
    )


def quantization_error_stats(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector reconstruction error of the int8 quantization:
    (id, scale, max_abs_err) with max_abs_err = max_i |q_i·scale −
    v_i| — the quantity whose ≤ scale/2 bound justifies shipping
    int8 to the ANN stage. Deterministic float math, reproducible in
    DuckDB list expressions → oracle hash-checked."""
    q = quantize_embeddings(embeddings, id_col, vec_col)
    e = _as_double(embeddings, vec_col).select(
        F.col(id_col), F.col(vec_col).alias("__v")
    )
    joined = q.join(e, id_col)
    err = F.array_max(
        F.zip_with(
            "qvec",
            "__v",
            lambda qi, vi: F.abs(qi.cast("double") * F.col("scale") - vi),
        )
    )
    # the error must be computed against the UNROUNDED scale, in a
    # projection where no rounded alias named "scale" exists yet: a
    # single select emitting round(scale) AS scale would re-resolve
    # the lambda's scale reference against the rounded output column
    # (alias shadowing) and shift every error by q·(rounding delta)
    return (
        joined.withColumn("__err", err)
        .select(
            id_col,
            F.round("scale", 9).alias("scale"),
            F.round("__err", 9).alias("max_abs_err"),
        )
    )


def mmr_rerank(
    candidates: DataFrame,
    vectors: DataFrame,
    k: int = 5,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking of an ANN candidate pool
    (Carbonell & Goldstein, SIGIR'98): greedily pick the candidate
    maximizing ``lam·sim(q,d) − (1−lam)·max_{s∈selected} sim(d,s)``
    — relevance traded against redundancy, the standard diverse-top-k
    for eval-set construction and retrieval.

    ``candidates`` is an ANN result (q_id, n_id, sim); ``vectors``
    supplies the embeddings. The greedy loop is inherently sequential
    PER QUERY but independent ACROSS queries, so the operator is an
    ``applyInPandas`` grouped by q_id: each group is a BOUNDED pool
    (the ANN top-N, tens of rows), the numpy loop runs executor-side,
    and queries parallelize across the cluster — no driver
    coordination, no per-round jobs. Determinism: ties broken by
    lowest n_id; scores rounded at the boundary.

    Output: (q_id, n_id, mmr_score, mmr_rank), ``k`` rows per query.
    """
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    vecs = _as_double(vectors, vec_col).select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_emb")
    )
    qvecs = _as_double(vectors, vec_col).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_emb")
    )
    pool = (
        candidates.select("q_id", "n_id")
        .join(vecs, "n_id")
        .join(F.broadcast(qvecs), "q_id")
    )
    out_schema = T.StructType(
        [
            T.StructField("q_id", T.LongType()),
            T.StructField("n_id", T.LongType()),
            T.StructField("mmr_score", T.DoubleType()),
            T.StructField("mmr_rank", T.IntegerType()),
        ]
    )

    def rerank(pdf):
        import numpy as np
        import pandas as pd

        order = np.argsort(pdf["n_id"].to_numpy())
        pdf = pdf.iloc[order]
        ids = pdf["n_id"].to_numpy()
        mat = np.asarray(pdf["n_emb"].tolist(), dtype=np.float64)
        q = np.asarray(pdf["q_emb"].iloc[0], dtype=np.float64)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-300)
        q = q / max(np.linalg.norm(q), 1e-300)
        qsim = mat @ q
        pairwise = mat @ mat.T
        m = len(ids)
        selected: list[int] = []
        remaining = np.ones(m, dtype=bool)
        rows = []
        for rank in range(1, min(k, m) + 1):
            if selected:
                redundancy = pairwise[:, selected].max(axis=1)
            else:
                redundancy = np.zeros(m)
            score = lam * qsim - (1.0 - lam) * redundancy
            score[~remaining] = -np.inf
            # argmax with lowest-n_id tiebreak: ids are sorted, so the
            # FIRST max index is the lowest id
            pick = int(np.argmax(score))
            selected.append(pick)
            remaining[pick] = False
            rows.append(
                (
                    int(pdf["q_id"].iloc[0]),
                    int(ids[pick]),
                    round(float(score[pick]), 6),
                    rank,
                )
            )
        return pd.DataFrame(
            rows, columns=["q_id", "n_id", "mmr_score", "mmr_rank"]
        )

    return pool.groupBy("q_id").applyInPandas(rerank, out_schema)


def embedding_decontaminate(
    train: DataFrame,
    eval_set: DataFrame,
    min_cosine: float = 0.5,
    nprobe_eval: int = 2,
    n_centroids: int = 16,
    sample: int = 2048,
    seed: int = 42,
    centroids: list | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SEMANTIC decontamination: flag every training vector whose
    embedding sits within ``min_cosine`` of ANY eval-set vector — the
    embedding-space sibling of the n-gram ``decontaminate`` family
    (lexical overlap misses paraphrased benchmark leakage; an
    embedding neighborhood probe is the standard second gate, the
    same contamination argument as Abbas et al. 2023's SemDedup).

    Spark-first shape: train vectors are assigned to ONE coarse
    Voronoi cell, eval vectors probe their ``nprobe_eval`` nearest
    cells (the IVF recall dial — a contaminated pair near a cell
    boundary is still caught when the eval side probes the
    neighboring cell), and the candidate join is per-cell with the
    eval side BROADCAST: eval suites are metadata-sized by nature
    (thousands of vectors against a 100 TB corpus), so the fact side
    never shuffles — assignment is one Arrow matmul pass at scan
    parallelism and the probe is a broadcast hash join on
    centroid_id. The only shuffled bytes in the whole plan are bare
    ids + packed longs (the hit aggregation and the final
    flag-attach join); vectors never ride any exchange. Recall is
    bounded by the cell partitioning exactly like SemDedup; raise
    ``nprobe_eval`` to trade cost for recall.

    Determinism/oracle: with a FIXED ``centroids`` list the whole
    answer — assignment argmax (stable tie-break on centroid index),
    candidate set, cosine, and the nearest-eval argmax — is a pure
    function of (vectors, literals) and sits under the DuckDB hash
    gate (``embedding_decontaminate`` registry key). The per-train
    argmax avoids struct-ordered max_by (SortAggregate trap): each
    hit packs ``(micro-cosine, eval id)`` into ONE long —
    ``ri * 2^33 - e_id`` with ``ri = round(cos * 1e6)`` ≤ 2^21, so
    the pack is exact in int64 and its max recovers both fields —
    keeping the aggregation a plain HashAggregate with map-side
    partials.

    Output: one row per train vector — (``id_col``, contaminated,
    n_hits, max_eval_cosine rounded to 6 dp, nearest_eval_id = the
    eval id of the highest micro-cosine, ties broken toward the
    SMALLEST eval id; clean vectors carry false/0/NULL/NULL)."""
    cents = (
        centroids
        if centroids is not None
        else train_ivf_centroids(
            train,
            n_centroids=n_centroids,
            sample=sample,
            seed=seed,
            id_col=id_col,
            vec_col=vec_col,
        )
    )
    t = _ivf_assign(
        train, cents, 1, "id_a", "emb_a", id_col=id_col, vec_col=vec_col
    )
    e = _ivf_assign(
        eval_set,
        cents,
        nprobe_eval,
        "id_b",
        "emb_b",
        id_col=id_col,
        vec_col=vec_col,
    )
    hits = _pair_cosine_arrow(
        t.join(F.broadcast(e), "centroid_id").select(
            "id_a", "id_b", "emb_a", "emb_b"
        )
    ).where(F.col("cos") >= F.lit(min_cosine))
    # exact int64 argmax pack: ri < 2^21 micro-cosines, ids < 2^33
    ri = F.round(F.col("cos") * F.lit(1000000.0)).cast("long")
    packed = hits.select(
        "id_a",
        "id_b",
        ri.alias("ri"),
        (ri * F.lit(8589934592) - F.col("id_b")).alias("pack"),
    )
    agg = packed.groupBy("id_a").agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.max("ri").alias("mx"),
        F.max("pack").alias("mp"),
    )
    return (
        train.select(F.col(id_col))
        .join(agg, F.col(id_col) == F.col("id_a"), "left")
        .select(
            id_col,
            F.col("n_hits").isNotNull().alias("contaminated"),
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            (F.col("mx") / F.lit(1000000.0)).alias("max_eval_cosine"),
            (F.col("mx") * F.lit(8589934592) - F.col("mp")).alias(
                "nearest_eval_id"
            ),
        )
    )
