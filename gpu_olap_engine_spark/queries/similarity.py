"""Similarity-search queries over ``embeddings`` + DuckDB oracles.

Oracle determinism: both engines sum identical DECIMAL(38,18) terms
(exact, order-independent), then do IEEE sqrt/divide — see
operators/similarity.py. The oracle unnests by index; Spark folds the
array. Same terms, same result bits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_olap_engine_spark.operators import similarity as S
from gpu_olap_engine_spark.queries import register
from gpu_olap_engine_spark.queries.dedup import _mat
from gpu_olap_engine_spark.queries.tables import T

# Integer-quantized cosine terms for pair (av, bv), unnested by index
# i (DuckDB lists are 1-based): floor(x*y*1e12) as BIGINT, summed
# exactly — the twin of operators.similarity._fold_scaled.
_TERMS = """
terms AS (
    SELECT {keys},
           CAST(floor(CAST(av[i] AS DOUBLE) * CAST(bv[i] AS DOUBLE) * 1e12) AS BIGINT) AS txy,
           CAST(floor(CAST(av[i] AS DOUBLE) * CAST(av[i] AS DOUBLE) * 1e12) AS BIGINT) AS txx,
           CAST(floor(CAST(bv[i] AS DOUBLE) * CAST(bv[i] AS DOUBLE) * 1e12) AS BIGINT) AS tyy
    FROM pairs, unnest(generate_series(1, len(av))) AS t(i)
),
scored AS (
    SELECT {keys},
           CAST(SUM(txy) AS DOUBLE)
           / (sqrt(CAST(SUM(txx) AS DOUBLE)) * sqrt(CAST(SUM(tyy) AS DOUBLE)))
               AS cosine
    FROM terms GROUP BY {keys}
)
"""


@register(
    "sim_bruteforce_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS av FROM embeddings
               WHERE vec_id < 5),
    c AS (SELECT vec_id AS neighbor_id, embedding AS bv FROM embeddings),
    pairs AS (SELECT query_id, neighbor_id, av, bv FROM q JOIN c
              ON neighbor_id != query_id),
    {_TERMS.format(keys="query_id, neighbor_id")},
    ranked AS (
        SELECT query_id, neighbor_id, cosine,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
               ) AS BIGINT) AS rnk
        FROM scored
    )
    SELECT query_id, neighbor_id, cosine, rnk FROM ranked WHERE rnk <= 10
    """,
)
def sim_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 cosine neighbors for query vectors vec_id<5:
    broadcast the query set, stream the corpus, per-query window top-k.
    The exact-recall baseline for the ANN variants below."""
    emb = T(spark, sf_dir, "embeddings")
    return S.brute_force_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=10
    ).withColumnRenamed("rank", "rnk")


@register(
    "sim_bucketed_ann",
    oracle=f"""
    WITH b AS (
        SELECT vec_id, embedding,
               CAST((CASE WHEN embedding[1] > 0 THEN 4 ELSE 0 END)
                  + (CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END)
                  + (CASE WHEN embedding[3] > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS bucket
        FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, embedding AS av, bucket FROM b
          WHERE vec_id < 5),
    c AS (SELECT vec_id AS neighbor_id, embedding AS bv, bucket FROM b),
    pairs AS (SELECT query_id, neighbor_id, av, bv FROM q JOIN c USING (bucket)
              WHERE neighbor_id != query_id),
    {_TERMS.format(keys="query_id, neighbor_id")},
    ranked AS (
        SELECT query_id, neighbor_id, cosine,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
               ) AS BIGINT) AS rnk
        FROM scored
    )
    SELECT query_id, neighbor_id, cosine, rnk FROM ranked WHERE rnk <= 5
    """,
)
def sim_bucketed_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: sign-bit coarse quantizer (3 leading dims -> 8
    buckets) prunes the corpus ~8x before exact scoring; top-5 within
    the query's bucket. At 100 TB the corpus is written partitioned by
    bucket so a probe is a single-partition scan."""
    emb = T(spark, sf_dir, "embeddings")
    return S.bucketed_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=5, bits=3
    ).withColumnRenamed("rank", "rnk")


def _block_sql(
    prefix: str = "",
    m: int = 10,
    include_pairs: bool = True,
    include_cand: bool = True,
) -> str:
    """DuckDB twin of operators.similarity.top_dim_keys blocking:
    candidates = pairs sharing >=1 of their top-m signed |value| dims
    (ties by lowest dim — matches the Spark struct sort exactly).
    Emits CTEs {p}dims/{p}topd/{p}bkeys (plus {p}cand and {p}pairs
    unless switched off — the quantized matmul twins verify straight
    off {p}bkeys and must not pay for a MATERIALIZED 100M-row
    distinct-pair relation they never read)."""
    p = prefix
    cand_cte = f""",
    {p}cand AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        FROM {p}bkeys a JOIN {p}bkeys b
          ON a.bkey = b.bkey AND a.vec_id < b.vec_id
    )""" if include_cand or include_pairs else ""
    pairs_cte = f""",
    {p}pairs AS (
        SELECT id_a, id_b, ea.embedding AS av, eb.embedding AS bv
        FROM {p}cand
        JOIN embeddings ea ON id_a = ea.vec_id
        JOIN embeddings eb ON id_b = eb.vec_id
    )""" if include_pairs else ""
    return f"""
    {p}dims AS (
        SELECT vec_id, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS val
        FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
    ),
    {p}topd AS (
        SELECT vec_id, dim, val,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY abs(val) DESC, dim) AS rn
        FROM {p}dims
    ),
    {p}bkeys AS (
        SELECT vec_id, dim * 2 + CASE WHEN val > 0 THEN 1 ELSE 0 END AS bkey
        FROM {p}topd WHERE rn <= {m}
    ){cand_cte}{pairs_cte}"""


# Near-dup hit CTEs, r9 bucket-blocked restructure (shared by
# sim_near_dup_pairs and sim_decontaminate): vectors quantize ONCE to
# integer-valued doubles floor(x*1e6) — every list_inner_product
# partial sum stays < 2^53, so the fold is exact in any order, the
# same reason the Spark side's dgemm is. The quantized vector + its
# norm PRE-JOIN onto the blocking-key relation (bq), so the candidate
# self-join hash-joins once on bkey with both vectors already in-row
# — the r8 shape's two per-candidate qn lookups re-materialized both
# vectors across the ~157M-row candidate relation and blew the ~sf1
# sweep budget (>900 s; this shape measures ~49 s at ~sf1). The
# threshold filter runs BEFORE the distinct. IEEE mult commutes
# bit-exactly, so a.nrm * b.nrm equals numpy's position-ordered
# product whatever the id order.
_ND_HITS = """qv AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> floor(CAST(x AS DOUBLE) * 1000000)) AS q
        FROM embeddings
    ),
    qn AS (
        SELECT vec_id, q, sqrt(list_inner_product(q, q)) AS nrm FROM qv
    ),
    bq AS (
        SELECT b.bkey, v.vec_id, v.q, v.nrm
        FROM bkeys b JOIN qn v USING (vec_id)
    ),
    hits AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
               list_inner_product(a.q, b.q) / (a.nrm * b.nrm) AS cosine
        FROM bq a
        JOIN bq b ON a.bkey = b.bkey AND a.vec_id < b.vec_id
        WHERE list_inner_product(a.q, b.q) / (a.nrm * b.nrm) >= 0.45
    )"""


@register(
    "sim_near_dup_pairs",
    # _mat: DuckDB re-inlines the multi-referenced blocking CTEs per
    # reference; MATERIALIZED keeps the ~sf1 twin inside the sweep's
    # 120 s budget (same rescue as the label-propagation oracles).
    oracle=_mat(f"""
    WITH {_block_sql(include_pairs=False, include_cand=False)},
    {_ND_HITS}
    SELECT id_a, id_b, cosine FROM hits
    """),
)
def sim_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (>= 0.45): inverted-index
    blocking on each vector's top-10 signed dims (prefix-filtering;
    142/144 recall at sf0.1 vs 113/144 at top-6), then per-bucket
    Gram verification (applyInPandas) — vectors move once per key,
    the quadratic verify runs in-core. r11 kernel: a float32 bound
    scan with a proven-superset margin prices the Gram cells at BLAS
    rate, survivors alone pay the exact integer dot + IEEE division,
    and the minimal-shared-key gate emits each pair from exactly one
    bucket (no terminal distinct) — sf10 98 -> 30-36 s on identical
    output (see operators/similarity.py near_dup_pairs). The oracle
    mirrors blocking AND quantized arithmetic bit-for-bit."""
    return S.near_dup_pairs(
        T(spark, sf_dir, "embeddings"), threshold=0.45, block_m=10,
        dim=64,  # fixture width — keeps construction job-free (r13)
    )


@register(
    "sim_decontaminate",
    oracle=_mat(f"""
    WITH {_block_sql(include_pairs=False, include_cand=False)},
    {_ND_HITS},
    tagged AS (
        SELECT id_b AS vec_id, cosine FROM hits
        WHERE id_a % 7 = 0 AND id_b % 7 != 0
        UNION ALL
        SELECT id_a AS vec_id, cosine FROM hits
        WHERE id_a % 7 != 0 AND id_b % 7 = 0
    )
    SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS n_eval_hits,
           MAX(cosine) AS max_cosine
    FROM tagged GROUP BY vec_id
    """),
)
def sim_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic benchmark decontamination (r9): flag training vectors
    whose embedding is near-duplicate (cosine >= 0.45) to ANY
    evaluation-set vector — the paraphrase-level complement of q73's
    exact 8-gram decontamination (an eval answer reworded shares no
    long n-gram but keeps its embedding). Eval set = the
    deterministic fixture stand-in vec_id % 7 == 0 (same convention
    as q73); in production the eval suite's own embeddings. Pairs
    use the same blocking + quantized Gram arithmetic as
    sim_near_dup_pairs, but through the ASYMMETRIC cross verify
    (gram_cross_pairs): only train x eval products are ever formed —
    the train side moves once per blocking key exactly like
    near_dup_pairs, while the tiny eval side replicates into each
    train chunk (the grouped-shuffle analog of a broadcast), so the
    quadratic train-train work the symmetric operator would pay is
    skipped entirely. Emits (vec_id, n_eval_hits, max_cosine) per
    contaminated training vector; max over bit-identical IEEE cosines
    is cross-engine exact."""
    keyed = S._near_dup_keyed(
        T(spark, sf_dir, "embeddings"), "vec_id", "embedding", 10
    )
    train = keyed.filter(F.col("vid") % 7 != 0)
    ev = keyed.filter(F.col("vid") % 7 == 0)
    return (
        S.gram_cross_pairs(train, ev, threshold=0.45)
        .groupBy(F.col("id_big").alias("vec_id"))
        .agg(
            F.count("*").cast("long").alias("n_eval_hits"),
            F.max("cosine").alias("max_cosine"),
        )
    )


@register(
    "sim_dedup_clusters",
    oracle=_mat(f"""
    WITH RECURSIVE {_block_sql(include_pairs=False, include_cand=False)},
    {_ND_HITS},
    edges AS (
        SELECT id_a AS a, id_b AS b FROM hits
        UNION SELECT id_b, id_a FROM hits
    ),
    nodes AS (SELECT DISTINCT a AS id FROM edges),
    reach AS (
        SELECT id, id AS root FROM nodes
        UNION
        SELECT e.b AS id, r.root FROM reach r JOIN edges e ON e.a = r.id
    )
    SELECT id AS vec_id, CAST(MIN(root) AS BIGINT) AS cluster_id
    FROM reach GROUP BY id
    """),
)
def sim_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive clusters over the EMBEDDING near-dup graph (r9): the
    semantic twin of dedup_clusters (which clusters the MinHash text
    graph) — connected components via iterative label propagation over
    sim_near_dup_pairs edges, cluster id = minimum reachable vec_id (a
    schedule-independent fixpoint; the oracle recomputes it with a
    recursive CTE). Together with sim_semdedup this completes the two
    standard semantic-dedup policies: cluster-bounded keep-lowest
    (SemDeDup) and full transitive closure; a curation pipeline picks
    one canonical per transitive cluster when paraphrase chains should
    collapse (A~B, B~C => one keeper even if cos(A,C) < threshold).
    Near-dup graphs are cliques-ish (tiny diameter), so label
    propagation converges in O(diameter) distributed rounds."""
    from gpu_olap_engine_spark.operators.graph import connected_components

    pairs = S.near_dup_pairs(
        T(spark, sf_dir, "embeddings"), threshold=0.45, block_m=10,
        dim=64,  # fixture width — construction stays job-free (r13)
    )
    return connected_components(pairs).select(
        F.col("id").cast("long").alias("vec_id"),
        F.col("cluster_id").cast("long").alias("cluster_id"),
    )


# Squared-L2 distance between a row vector `v` and a centroid list
# `cv`, replicating operators.similarity._sq_l2's IEEE fold exactly:
# terms in dim order, left-to-right addition (list_reduce(t1..tn) ==
# Spark's aggregate(0.0 + t1 + ... + tn) since 0.0 + t1 == t1).
def _o_sq_l2(v: str, cv: str) -> str:
    return f"""list_reduce(
        list_transform(generate_series(1, len({v})),
            i -> (CAST({v}[i] AS DOUBLE) - {cv}[i])
               * (CAST({v}[i] AS DOUBLE) - {cv}[i])),
        (x, y) -> x + y)"""


def _kmeans_member_ctes(k: int = 8, iters: int = 3) -> list[str]:
    """Unrolled-CTE k-means shared by the IVF and SemDeDup oracles:
    CTE pairs (assign a{i} -> update c{i}) over the same exact
    arithmetic as operators.similarity.kmeans_centroids — init = k
    lowest-vec_id embeddings widened to double, assignment argmin on
    the ordered IEEE fold with ties to the lowest cluster id, centroid
    means from exact int64 sums of floor(x*1e6) divided as s/1e6/n,
    empty clusters keeping their previous centroid. The final CTE
    `members` assigns every vector its cluster."""
    ctes = [
        f"""c0 AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS ci,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cvec
        FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT {k})
    )"""
    ]
    for it in range(1, iters + 1):
        ctes.append(f"""a{it} AS (
        SELECT vec_id, embedding, ci AS c FROM (
            SELECT e.vec_id, e.embedding, c.ci,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY {_o_sq_l2("e.embedding", "c.cvec")} ASC, c.ci ASC
                   ) AS rn
            FROM embeddings e CROSS JOIN c{it - 1} c
        ) WHERE rn = 1
    )""")
        ctes.append(f"""c{it} AS (
        SELECT p.ci, CASE WHEN m.c IS NULL THEN p.cvec ELSE m.cvec END AS cvec
        FROM c{it - 1} p LEFT JOIN (
            SELECT c, list(CAST(s AS DOUBLE) / 1000000.0 / n ORDER BY dim) AS cvec
            FROM (
                SELECT c, dd.i AS dim,
                       SUM(CAST(floor(CAST(embedding[dd.i] AS DOUBLE) * 1000000.0)
                           AS BIGINT)) AS s,
                       COUNT(*) AS n
                FROM a{it}, unnest(generate_series(1, len(embedding))) AS dd(i)
                GROUP BY c, dd.i
            ) GROUP BY c, n
        ) m ON p.ci = m.c
    )""")
    ctes.append(f"""members AS (
        SELECT vec_id, embedding, ci AS c FROM (
            SELECT e.vec_id, e.embedding, c.ci,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY {_o_sq_l2("e.embedding", "c.cvec")} ASC, c.ci ASC
                   ) AS rn
            FROM embeddings e CROSS JOIN c{iters} c
        ) WHERE rn = 1
    )""")
    return ctes


def _kmeans_oracle(k: int = 8, iters: int = 3, nprobe: int = 2, topk: int = 5) -> str:
    """DuckDB twin of operators.similarity.kmeans_ivf_topk — the
    shared k-means member CTEs plus nprobe cluster probing and exact
    within-cluster scoring."""
    ctes = _kmeans_member_ctes(k, iters)
    body = f"""probes AS (
        SELECT query_id, q_vec, ci AS cluster FROM (
            SELECT e.vec_id AS query_id, e.embedding AS q_vec, c.ci,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY {_o_sq_l2("e.embedding", "c.cvec")} ASC, c.ci ASC
                   ) AS rn
            FROM embeddings e CROSS JOIN c{iters} c
            WHERE e.vec_id < 5
        ) WHERE rn <= {nprobe}
    ),
    pairs AS (
        SELECT p.query_id, m.vec_id AS neighbor_id, p.q_vec AS av, m.embedding AS bv
        FROM probes p JOIN members m ON p.cluster = m.c
        WHERE m.vec_id != p.query_id
    ),
    {_TERMS.format(keys="query_id, neighbor_id")},
    ranked AS (
        SELECT query_id, neighbor_id, cosine,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
               ) AS BIGINT) AS rnk
        FROM scored
    )
    SELECT query_id, neighbor_id, cosine, rnk FROM ranked WHERE rnk <= {topk}"""
    return "WITH " + ",\n    ".join(ctes) + ",\n    " + body


@register("sim_ivf_kmeans", oracle=_kmeans_oracle())
def sim_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned-quantizer IVF ANN: deterministic k-means (integer-
    quantized centroid updates, fixed init and iteration count, ties
    to the lowest cluster id) + nprobe=2 cluster probing. Every step
    is exact or IEEE-deterministic, so the full iterative algorithm is
    value-checked against an unrolled SQL twin (_kmeans_oracle);
    recall and run-to-run determinism are additionally asserted in
    tests/test_operators."""
    emb = T(spark, sf_dir, "embeddings")
    return S.kmeans_ivf_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=5, n_clusters=8, iters=3, nprobe=2
    )


# sim_random_hyperplane_lsh hash geometry (shared Spark <-> oracle):
_LSH_TABLES, _LSH_PLANES, _LSH_MAX_DIST = 3, 8, 8.0


@register(
    "sim_random_hyperplane_lsh",
    # Mirrors operators.similarity.hyperplane_lsh_pairs bit-for-bit:
    # hyperplane weight (t,p,d) = (((t*P+p)*1000003 + d) * 2654435761
    # % 2000001 - 1000000) / 1e6 (pure int64 hash + one IEEE divide),
    # signature bit = sign of the quantized dot, candidates share a
    # full bucket in >=1 table, verify = quantized euclidean distance.
    oracle=f"""
    WITH dots AS (
        SELECT e.vec_id, tt.t, pp.p,
               SUM(CAST(floor((CAST(e.embedding[dd.i] AS DOUBLE)
                   * ((((tt.t * {_LSH_PLANES} + pp.p) * 1000003 + (dd.i - 1))
                       * 2654435761 % 2000001 - 1000000) / 1000000.0))
                   * 1e12) AS BIGINT)) AS dot
        FROM embeddings e,
             unnest(generate_series(0, {_LSH_TABLES - 1})) AS tt(t),
             unnest(generate_series(0, {_LSH_PLANES - 1})) AS pp(p),
             unnest(generate_series(1, len(e.embedding))) AS dd(i)
        GROUP BY e.vec_id, tt.t, pp.p
    ),
    sigs AS (
        SELECT vec_id, t,
               SUM(CASE WHEN dot > 0 THEN (1::BIGINT << p) ELSE 0 END) AS bucket
        FROM dots GROUP BY vec_id, t
    ),
    cand AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        FROM sigs a JOIN sigs b
          ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id
    ),
    pairs AS (
        SELECT id_a, id_b, ea.embedding AS av, eb.embedding AS bv
        FROM cand JOIN embeddings ea ON id_a = ea.vec_id
                  JOIN embeddings eb ON id_b = eb.vec_id
    ),
    dsums AS (
        SELECT id_a, id_b,
               SUM(CAST(floor(((CAST(av[i] AS DOUBLE) - CAST(bv[i] AS DOUBLE))
                   * (CAST(av[i] AS DOUBLE) - CAST(bv[i] AS DOUBLE))) * 1e12)
                   AS BIGINT)) AS s
        FROM pairs, unnest(generate_series(1, len(av))) AS t(i)
        GROUP BY id_a, id_b
    )
    SELECT id_a, id_b, sqrt(CAST(s AS DOUBLE)) / 1000000.0 AS dist
    FROM dsums
    WHERE sqrt(CAST(s AS DOUBLE)) / 1000000.0 <= {_LSH_MAX_DIST}
    """,
)
def sim_random_hyperplane_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane (sign-projection) LSH near-neighbor pairs
    within euclidean distance 8.0 — repo-deterministic hyperplanes
    from an integer hash of (table, plane, dim), so the result is
    bit-reproducible across engines and the oracle checks values
    (the pyspark.ml seeded variant this replaces was JVM-random and
    could only ever get a rows-only check). 3 tables x 8-bit
    signatures; candidates from the (table, bucket) equi-join only."""
    return S.hyperplane_lsh_pairs(
        T(spark, sf_dir, "embeddings"),
        n_tables=_LSH_TABLES,
        n_planes=_LSH_PLANES,
        max_dist=_LSH_MAX_DIST,
    )


def ml_random_hyperplane_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Library integration path (unregistered): pyspark.ml
    BucketedRandomProjectionLSH — seeded, reproducible within Spark,
    but its hyperplanes are JVM-random so no cross-engine oracle is
    possible; kept as the off-the-shelf alternative to
    operators.similarity.hyperplane_lsh_pairs."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    emb = T(spark, sf_dir, "embeddings").select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=2.0, numHashTables=3, seed=42
    )
    model = lsh.fit(emb)
    pairs = model.approxSimilarityJoin(emb, emb, 8.0, distCol="dist")
    return (
        pairs.filter(F.col("datasetA.vec_id") < F.col("datasetB.vec_id"))
        .select(
            F.col("datasetA.vec_id").alias("id_a"),
            F.col("datasetB.vec_id").alias("id_b"),
            F.col("dist"),
        )
    )


def _pq_oracle(
    dim: int = 64, m: int = 8, k_codes: int = 8, iters: int = 2, topk: int = 5
) -> str:
    """DuckDB twin of operators.similarity.pq_adc_topk: one unrolled
    deterministic-k-means CTE chain PER SUBSPACE (prefix p{j}) over
    the vector slice, a code join per subspace for the ADC sum (terms
    added in fixed subspace order, matching the Spark expression's
    left-to-right adds), rank ties to the lowest neighbor id. dim is
    pinned to the fixture's 64 (the Spark side checks divisibility at
    runtime)."""
    sub = dim // m
    ctes = []
    for j in range(m):
        p, s, e = f"p{j}", j * sub + 1, (j + 1) * sub
        vs = f"list_slice(embedding, {s}, {e})"
        vs_e = f"list_slice(e.embedding, {s}, {e})"
        ctes.append(f"""{p}c0 AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS ci,
               list_transform({vs}, x -> CAST(x AS DOUBLE)) AS cvec
        FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id
              LIMIT {k_codes})
    )""")
        for it in range(1, iters + 1):
            ctes.append(f"""{p}a{it} AS (
        SELECT vec_id, embedding, ci AS c FROM (
            SELECT e.vec_id, e.embedding, c.ci,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY {_o_sq_l2(vs_e, "c.cvec")} ASC, c.ci ASC
                   ) AS rn
            FROM embeddings e CROSS JOIN {p}c{it - 1} c
        ) WHERE rn = 1
    )""")
            ctes.append(f"""{p}c{it} AS (
        SELECT prev.ci, CASE WHEN upd.c IS NULL THEN prev.cvec
                             ELSE upd.cvec END AS cvec
        FROM {p}c{it - 1} prev LEFT JOIN (
            SELECT c, list(CAST(sq AS DOUBLE) / 1000000.0 / n ORDER BY dim)
                       AS cvec
            FROM (
                SELECT c, dd.i AS dim,
                       SUM(CAST(floor(CAST({vs}[dd.i] AS DOUBLE) * 1000000.0)
                           AS BIGINT)) AS sq,
                       COUNT(*) AS n
                FROM {p}a{it}, unnest(generate_series(1, {sub})) AS dd(i)
                GROUP BY c, dd.i
            ) GROUP BY c, n
        ) upd ON prev.ci = upd.c
    )""")
        ctes.append(f"""{p}enc AS (
        SELECT vec_id, ci AS code FROM (
            SELECT e.vec_id, c.ci,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY {_o_sq_l2(vs_e, "c.cvec")} ASC, c.ci ASC
                   ) AS rn
            FROM embeddings e CROSS JOIN {p}c{iters} c
        ) WHERE rn = 1
    )""")
    enc_cols = ", ".join(f"e{j}.code AS c{j}" for j in range(m))
    enc_joins = " ".join(
        f"JOIN p{j}enc e{j} ON e{j}.vec_id = e0.vec_id" for j in range(1, m)
    )
    ctes.append(f"""enc AS (
        SELECT e0.vec_id AS neighbor_id, {enc_cols}
        FROM p0enc e0 {enc_joins}
    )""")
    code_joins = " ".join(
        f"JOIN p{j}c{iters} b{j} ON b{j}.ci = pairsq.c{j}" for j in range(m)
    )
    adc = " + ".join(
        _o_sq_l2(f"list_slice(q_emb, {j * sub + 1}, {(j + 1) * sub})", f"b{j}.cvec")
        for j in range(m)
    )
    body = f"""pairsq AS (
        SELECT qq.vec_id AS query_id, qq.embedding AS q_emb, n.*
        FROM embeddings qq, enc n
        WHERE qq.vec_id < 5 AND n.neighbor_id != qq.vec_id
    ),
    scored AS (
        SELECT query_id, neighbor_id, {adc} AS adc_dist
        FROM pairsq {code_joins}
    ),
    ranked AS (
        SELECT query_id, neighbor_id, adc_dist,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY adc_dist ASC, neighbor_id
               ) AS BIGINT) AS rnk
        FROM scored
    )
    SELECT query_id, neighbor_id, adc_dist, rnk FROM ranked
    WHERE rnk <= {topk}"""
    return "WITH " + ",\n    ".join(ctes) + ",\n    " + body


@register("sim_pq_adc_topk", oracle=_pq_oracle())
def sim_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with asymmetric distance: 8 subspaces
    x 8-code deterministic k-means codebooks compress each corpus
    vector to 8 small ints (the billion-scale memory trick); queries
    score candidates by summed subspace distances to code centroids.
    Fully oracle-checked — the SQL twin unrolls all 8 per-subspace
    k-means chains over the same exact arithmetic."""
    emb = T(spark, sf_dir, "embeddings")
    return S.pq_adc_topk(
        emb, emb.filter(F.col("vec_id") < 5), m=8, k_codes=8, iters=2, k=5
    )


def _semdedup_oracle(k: int = 8, iters: int = 3, threshold: float = 0.45) -> str:
    """SemDeDup twin: shared k-means member CTEs, within-cluster
    pairwise exact cosine, keep-lowest-id election. r9: the verify
    mirrors the operator's vector-level quantization (floor(x*1e6)
    once per vector, exact integer list_inner_product — the same
    bulk-verify convention as sim_near_dup_pairs) with vector + norm
    pre-joined onto the cluster relation, replacing the per-pair
    64-row unnest/_TERMS group-by that re-materialized ~1.6G rows at
    ~sf1 (>900 s -> 6.6 s)."""
    ctes = _kmeans_member_ctes(k, iters)
    body = f"""sq AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> floor(CAST(x AS DOUBLE) * 1000000)) AS q
        FROM embeddings
    ),
    sqn AS (
        SELECT vec_id, q, sqrt(list_inner_product(q, q)) AS nrm FROM sq
    ),
    mq AS (
        SELECT m.vec_id, m.c, v.q, v.nrm
        FROM members m JOIN sqn v USING (vec_id)
    ),
    dropped AS (
        SELECT DISTINCT b.vec_id
        FROM mq a JOIN mq b ON a.c = b.c AND a.vec_id < b.vec_id
        WHERE list_inner_product(a.q, b.q) / (a.nrm * b.nrm)
              >= {threshold}
    )
    SELECT m.vec_id, m.c AS cluster, d.vec_id IS NULL AS is_kept
    FROM members m LEFT JOIN dropped d USING (vec_id)"""
    return "WITH " + ",\n    ".join(ctes) + ",\n    " + body


@register("sim_semdedup", oracle=_mat(_semdedup_oracle()))
def sim_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (arXiv:2303.09540) keep/drop decision for every
    embedding: deterministic k-means bounds the pairwise cosine pass
    to within-cluster equi-joined candidates; any vector with a
    lower-id near-duplicate (cosine >= 0.45, the fixture's planted-
    pair band) in its cluster is dropped. The full iterative pipeline
    — centroid fitting, assignment, candidate generation, exact
    scoring, election — is value-checked against the unrolled SQL
    twin, so a drift anywhere (centroid arithmetic, tie-breaks,
    election direction) flips a boolean and hash-mismatches."""
    emb = T(spark, sf_dir, "embeddings")
    return S.semdedup(emb, n_clusters=8, iters=3, threshold=0.45)
