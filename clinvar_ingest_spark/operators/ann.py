"""Approximate nearest-neighbor search over embedding columns.

Four physical strategies, all oracle-checked:

* ``cosine_topk`` — exact brute force: broadcast the (small) query set
  against the corpus, rank per query. O(|Q|·n) dot products, all inside
  codegen'd higher-order functions; the right plan when |Q| is small.
* ``lsh_cosine_topk`` — sign-of-first-dims bucketing (the simplest
  deterministic bucketer; kept as the minimal variant).
* ``hyperplane_lsh_topk`` — REAL random-hyperplane cosine LSH with
  md5-seeded deterministic planes: textbook (1 − θ/π)^n collision bound.
* ``ivf_cosine_topk`` — inverted-file cells with a shuffle-free
  centroid-literal assignment; ``centroid_mode="kmeans1"`` gives real
  data-dependent centroids (one Lloyd step from deterministic seeding).

Bucketed variants' recall < 1 by design; the oracles replay the same
buckets/cells so correctness is checked exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from clinvar_ingest_spark.functions.similarity import (
    cosine,
    hyperplane_bucket,
    hyperplane_planes,
)


def _ranked(pairs: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine; ties broken by neighbor id (deterministic)."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
        )
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    pairs = q.crossJoin(c).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 4).alias("cos_sim"),
    )
    return _ranked(pairs, k)


def sign_bucket(vec_col, n_bits: int = 4):
    """Deterministic LSH bucket: sign bits of the first n_bits dims
    (a fixed, engine-portable stand-in for random hyperplanes)."""
    b = F.lit(0)
    for i in range(n_bits):
        b = b + F.when(F.element_at(vec_col, i + 1) > 0, F.lit(1 << i)).otherwise(
            F.lit(0)
        )
    return b


def _assign_to_cents(
    corpus: DataFrame,
    cent_rows: list[tuple[int, list[float]]],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Shuffle-free nearest-centroid assignment: centroids ride the plan
    as an array literal; argmax via transform + array_max/array_position
    (first max ⇒ lowest cell id on ties) in one narrow pass."""
    cent_lit = F.array(
        *[F.array(*[F.lit(float(x)) for x in v]) for _c, v in cent_rows]
    )
    cell_id_lit = F.array(*[F.lit(int(c)) for c, _v in cent_rows])
    sims = F.transform(cent_lit, lambda c: cosine(F.col(vec_col), c))
    best = F.array_position(sims, F.array_max(sims)).cast("int")
    return corpus.select(F.col(id_col), F.col(vec_col)).withColumn(
        "cell_id", F.element_at(cell_id_lit, best)
    )


def kmeans_centroids(
    corpus: DataFrame,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_steps: int = 1,
    sample_mod: int | None = None,
) -> list[tuple[int, list[float]]]:
    """REAL data-dependent IVF centroids: ``n_steps`` Lloyd iterations
    over a deterministic sample.

    * sample: ``id % sample_mod == 0`` — a fixed, engine-reproducible
      subset (no RNG); the Lloyd estimator converges at ~10⁵
      vectors/cell, so at 10^10 vectors the quantizer trains on a
      sliver while the FULL corpus is only touched by the final
      shuffle-free assignment. Pick sample_mod coprime with n_cells so
      the modulo seeding still covers every cell.
    * seeds: element-wise mean of each ``id % n_cells`` group of the
      sample;
    * each step: assign the sample to its nearest centroid (cosine,
      shuffle-free literal argmax), recompute per-cell means; a cell
      that lost all members keeps its previous centroid.

    Means are rounded to 6 dp at each step so the identical centroid
    constants arise in DuckDB's replay (sum-order float drift is
    absorbed by the rounding).
    """
    def _avg_rows(df, cell_col):
        rows = (
            df.select(
                cell_col.alias("cell"),
                F.posexplode(F.col(vec_col)).alias("pos", "val"),
            )
            .groupBy("cell", "pos")
            .agg(F.round(F.avg(F.col("val").cast("double")), 6).alias("c"))
            .collect()
        )
        out: dict[int, dict[int, float]] = {}
        for r in rows:
            out.setdefault(int(r["cell"]), {})[int(r["pos"])] = float(r["c"])
        return {
            c: [byp[p] for p in sorted(byp)] for c, byp in out.items()
        }

    sample = corpus
    if sample_mod is not None and sample_mod > 1:
        sample = corpus.filter(F.col(id_col) % sample_mod == 0)
    cents = _avg_rows(sample, (F.col(id_col) % n_cells).cast("int"))
    for _ in range(max(n_steps, 0)):
        assigned = _assign_to_cents(sample, sorted(cents.items()), id_col, vec_col)
        refined = _avg_rows(assigned, F.col("cell_id"))
        cents = {**cents, **refined}  # empty cells keep previous centroid
    return sorted(cents.items())


def kmeans1_centroids(
    corpus: DataFrame,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """One full-corpus Lloyd step (the round-2 quantizer, kept for
    compatibility); see :func:`kmeans_centroids` for the sampled
    multi-step path."""
    return kmeans_centroids(corpus, n_cells, id_col, vec_col, n_steps=1)


def ivf_assign(
    corpus: DataFrame,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_mode: str = "first",
) -> tuple[DataFrame, DataFrame]:
    """IVF coarse quantizer: deterministic centroids (the first
    ``n_cells`` vectors by id — a seeded-sample stand-in for k-means;
    swap in KMeans.fit on a sample in prod), every vector assigned to
    its nearest centroid by cosine.

    Returns (centroids, assignments). The assignment is genuinely
    shuffle-free: the n_cells centroids are collected driver-side
    (metadata-scale — they fit by construction; beyond ~10³ cells use a
    two-level quantizer) and baked into the plan as an array literal,
    so each corpus row computes its nearest cell with ``transform`` +
    ``array_max``/``array_position`` in ONE narrow codegen'd pass — no
    row expansion, no Exchange between the corpus scan and the
    assignment. Ties break toward the lowest cell_id (centroids are
    ordered by id in the literal; array_position takes the first max),
    matching the previous window tiebreak.
    """
    if centroid_mode == "kmeans1":
        pairs = kmeans1_centroids(corpus, n_cells, id_col, vec_col)
    elif centroid_mode == "kmeans":
        # production shape: 2 Lloyd steps over the deterministic 1-in-3
        # sample (coprime with n_cells=8 so every cell gets a seed)
        pairs = kmeans_centroids(
            corpus, n_cells, id_col, vec_col, n_steps=2, sample_mod=3
        )
    elif centroid_mode == "first":
        rows = (
            corpus.orderBy(id_col)
            .limit(n_cells)
            .select(F.col(id_col).alias("cell_id"), F.col(vec_col).alias("centroid"))
            .collect()
        )
        pairs = [(int(r["cell_id"]), [float(x) for x in r["centroid"]]) for r in rows]
    else:
        raise ValueError(f"unknown centroid_mode {centroid_mode!r}")
    cents = F.broadcast(
        corpus.sparkSession.createDataFrame(
            [(c, v) for c, v in pairs],
            "cell_id int, centroid array<double>",
        )
    )
    assigned = _assign_to_cents(corpus, pairs, id_col, vec_col)
    return cents, assigned


def ivf_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_mode: str = "first",
) -> DataFrame:
    """IVF ANN: queries probe their ``n_probe`` nearest cells and score
    only vectors in those cells — the classic inverted-file scale path
    (candidates ≈ corpus · n_probe / n_cells instead of the full scan).
    Recall < 1 by design; determinism comes from the fixed centroids
    and (rounded sim, id) ranking."""
    cents, assigned = ivf_assign(corpus, n_cells, id_col, vec_col, centroid_mode)
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    q_cells = q.crossJoin(cents).select(
        "query_id", "qv", "cell_id",
        cosine(F.col("qv"), F.col("centroid")).alias("_sim"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("_sim"), F.asc("cell_id"))
    probes = (
        q_cells.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= n_probe)
        .select("query_id", "qv", "cell_id")
    )
    cands = probes.join(
        assigned.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), "cell_id"
        ),
        "cell_id",
    )
    pairs = cands.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 4).alias("cos_sim"),
    ).distinct()
    return _ranked(pairs, k)


def two_level_assign(
    corpus: DataFrame,
    n_coarse: int = 4,
    n_fine: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Two-level IVF quantizer — the scale path past ~10³ cells, where
    a flat centroid literal would bloat the plan and cost n_cells
    cosines per row. Level 1: ``n_coarse`` centroids (modulo-seeded
    sample means) assigned by the shuffle-free literal argmax. Level 2:
    per coarse cell, ``n_fine`` centroids (means of the cell's
    ``id % n_fine`` subgroups); the fine table rides the plan as a
    NESTED literal indexed by coarse id, so each row computes
    n_coarse + n_fine cosines instead of n_coarse·n_fine — still zero
    Exchanges between the scan and the assignment.

    Returns (fine_table, assigned) where assigned carries
    (id, vec, coarse_id, cell_id) and fine_table rows are
    (coarse_id, fine_id, cell_id, centroid); cell_id =
    coarse_id · n_fine + fine_id.
    """
    coarse = kmeans_centroids(corpus, n_coarse, id_col, vec_col, n_steps=0)
    a1 = _assign_to_cents(corpus, coarse, id_col, vec_col).withColumnRenamed(
        "cell_id", "coarse_id"
    )
    # fine centroids: 6dp-rounded means per (coarse, id % n_fine)
    rows = (
        a1.select(
            "coarse_id",
            (F.col(id_col) % n_fine).cast("int").alias("fine_seed"),
            F.posexplode(F.col(vec_col)).alias("pos", "val"),
        )
        .groupBy("coarse_id", "fine_seed", "pos")
        .agg(F.round(F.avg(F.col("val").cast("double")), 6).alias("c"))
        .collect()
    )
    fine: dict[tuple[int, int], dict[int, float]] = {}
    for r in rows:
        fine.setdefault((int(r["coarse_id"]), int(r["fine_seed"])), {})[
            int(r["pos"])
        ] = float(r["c"])
    fine_list = sorted(
        ((c, f), [byp[p] for p in sorted(byp)]) for (c, f), byp in fine.items()
    )
    # nested literal: index 1..n_coarse → array of that cell's fine centroids
    by_coarse: dict[int, list[tuple[int, list[float]]]] = {}
    for (c, f), v in fine_list:
        by_coarse.setdefault(c, []).append((f, v))
    coarse_ids = sorted(by_coarse)
    nested = F.array(
        *[
            F.array(
                *[
                    F.array(*[F.lit(float(x)) for x in v])
                    for _f, v in sorted(by_coarse[c])
                ]
            )
            for c in coarse_ids
        ]
    )
    fine_ids_lit = F.array(
        *[
            F.array(*[F.lit(int(f)) for f, _v in sorted(by_coarse[c])])
            for c in coarse_ids
        ]
    )
    coarse_pos = {c: i + 1 for i, c in enumerate(coarse_ids)}
    pos_map = F.map_from_arrays(
        F.array(*[F.lit(int(c)) for c in coarse_ids]),
        F.array(*[F.lit(int(coarse_pos[c])) for c in coarse_ids]),
    )
    cands = F.element_at(nested, F.element_at(pos_map, F.col("coarse_id")))
    sims = F.transform(cands, lambda cv: cosine(F.col(vec_col), cv))
    best = F.array_position(sims, F.array_max(sims)).cast("int")
    fine_id = F.element_at(
        F.element_at(fine_ids_lit, F.element_at(pos_map, F.col("coarse_id"))), best
    )
    assigned = a1.withColumn("fine_id", fine_id).withColumn(
        "cell_id", F.col("coarse_id") * n_fine + F.col("fine_id")
    )
    fine_table = F.broadcast(
        corpus.sparkSession.createDataFrame(
            [(c, f, c * n_fine + f, v) for (c, f), v in fine_list],
            "coarse_id int, fine_id int, cell_id int, centroid array<double>",
        )
    )
    return fine_table, assigned


def ivf2_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_coarse: int = 4,
    n_fine: int = 4,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-level IVF ANN: a query picks its nearest COARSE cell, then
    probes its ``n_probe`` nearest FINE cells within it — candidate set
    ≈ corpus · n_probe / (n_coarse·n_fine) with only
    n_coarse + n_fine centroid distances per query."""
    fine_table, assigned = two_level_assign(
        corpus, n_coarse, n_fine, id_col, vec_col
    )
    coarse = kmeans_centroids(corpus, n_coarse, id_col, vec_col, n_steps=0)
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    q1 = _assign_to_cents(
        q.withColumnRenamed("query_id", id_col).withColumnRenamed("qv", vec_col),
        coarse, id_col, vec_col,
    ).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.col("cell_id").alias("coarse_id"),
    )
    q_cells = q1.join(fine_table, "coarse_id").select(
        "query_id", "qv", "cell_id",
        cosine(F.col("qv"), F.col("centroid")).alias("_sim"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("_sim"), F.asc("cell_id"))
    probes = (
        q_cells.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= n_probe)
        .select("query_id", "qv", "cell_id")
    )
    cands = probes.join(
        assigned.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), "cell_id"
        ),
        "cell_id",
    )
    pairs = cands.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 4).alias("cos_sim"),
    ).distinct()
    return _ranked(pairs, k)


def hyperplane_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Random-hyperplane LSH ANN — the *real* cosine-LSH variant (vs the
    sign-of-first-dims stand-in in :func:`lsh_cosine_topk`): n_planes
    md5-seeded pseudo-random hyperplanes, bucket bit i = sign(v·p_i),
    giving the textbook collision probability (1 − θ/π)^n_planes. Plane
    constants are deterministic, so the oracle replays them exactly.
    The candidate join stays an equi join on the bucket id."""
    planes = hyperplane_planes(n_planes, dim)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        hyperplane_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        hyperplane_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    pairs = q.join(c, "bucket").select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 4).alias("cos_sim"),
    )
    return _ranked(pairs, k)


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 4,
) -> DataFrame:
    """Bucketed ANN: only same-bucket candidates are scored. The
    candidate join is an equi join on the bucket id — shuffle-partitioned,
    no cross join, so it scales to corpora where |Q|·n is infeasible."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        sign_bucket(F.col(vec_col), n_bits).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        sign_bucket(F.col(vec_col), n_bits).alias("bucket"),
    )
    pairs = q.join(c, "bucket").select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 4).alias("cos_sim"),
    )
    return _ranked(pairs, k)


# ------------------------------------------------------------------ PQ
def _l2(a, b):
    """Euclidean distance of two double arrays (sequential fold — the
    same left-to-right summation DuckDB's list_distance performs, so
    the encode ordering is engine-portable)."""
    return F.sqrt(
        F.aggregate(
            F.zip_with(
                a,
                b,
                lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def pq_train(
    corpus: DataFrame,
    dim: int,
    m: int = 4,
    n_codes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_steps: int = 0,
    sample_mod: int | None = None,
) -> list[list[tuple[int, list[float]]]]:
    """Product-quantization codebooks: the vector is split into ``m``
    subspaces of ``dim/m`` dims and each subspace gets its own
    ``n_codes``-entry codebook from the deterministic quantizer
    (:func:`kmeans_centroids` on the sliced subvectors — seeds at
    ``n_steps=0``, Lloyd-refined above).

    PQ is the memory-scale ANN path: a 64-dim float32 vector (256 B)
    becomes ``m`` uint8 codes (m bytes) — at 10^10 vectors the code
    table fits where the raw vectors never will, and scoring touches
    codes + a per-query lookup structure only."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d_sub = dim // m
    books = []
    for j in range(m):
        sub = corpus.select(
            F.col(id_col),
            F.slice(F.col(vec_col), j * d_sub + 1, d_sub).alias(vec_col),
        )
        books.append(
            kmeans_centroids(
                sub, n_cells=n_codes, id_col=id_col, vec_col=vec_col,
                n_steps=n_steps, sample_mod=sample_mod,
            )
        )
    return books


def pq_encode(
    corpus: DataFrame,
    books: list[list[tuple[int, list[float]]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, code_0..code_{m-1}) — nearest codebook entry per subspace
    (L2, ties to the lowest code), computed against codebook LITERALS
    in one narrow shuffle-free pass (plan-asserted): the encode of a
    100-TB corpus runs at scan parallelism with zero exchanges."""
    out = corpus.select(F.col(id_col), F.col(vec_col))
    d_sub = len(books[0][0][1])
    for j, book in enumerate(books):
        book_lit = F.array(
            *[F.array(*[F.lit(float(x)) for x in v]) for _c, v in book]
        )
        sub = F.slice(F.col(vec_col), j * d_sub + 1, d_sub)

        def _dist_to(s):
            # factory, NOT a default-arg lambda: pyspark treats any
            # 2-arg HOF lambda as (element, index) and rebinds the
            # default to the index column
            return lambda c: _l2(s, c)

        dists = F.transform(book_lit, _dist_to(sub))
        out = out.withColumn(
            f"code_{j}",
            (F.array_position(dists, F.array_min(dists)) - 1).cast("int"),
        )
    return out.drop(vec_col)


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    m: int = 4,
    n_codes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_steps: int = 0,
    sample_mod: int | None = None,
    use_lut: bool = True,
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: each candidate is
    scored as cosine(query, RECONSTRUCTION from its codebook entries).

    Plan shape is the scale story: the corpus is represented by its
    (id, codes) table; queries broadcast; no shuffle of the corpus, no
    raw-vector reads. Two ADC flavors:

    * ``use_lut=True`` (default, the production shape): the per-query
      m×n_codes dot-product lookup table is precomputed ONCE per query
      on the tiny broadcast side (``lut_j[c] = dot(q_j, book_j[c])``),
      and the query-independent codebook-entry norms are plan literals
      — each candidate costs m ``element_at`` adds for the numerator
      plus m for the reconstruction norm, independent of ``d_sub``.
      cosine(q, recon) decomposes exactly because the reconstruction
      is a concat of per-subspace entries:
      ``dot = Σ_j lut_j[code_j]``, ``|recon|² = Σ_j |book_j[code_j]|²``.
    * ``use_lut=False``: the candidate's vector is reconstructed via
      codebook literals and scored with the generic cosine — the same
      arithmetic paying m·d_sub multiplies per candidate; kept for the
      microbench comparison (tools/pq_adc_bench.py)."""
    books = pq_train(
        corpus, dim, m, n_codes, id_col, vec_col, n_steps, sample_mod
    )
    codes = pq_encode(corpus, books, id_col, vec_col)
    d_sub = dim // m
    book_lits = [
        F.array(
            *[F.array(*[F.lit(float(x)) for x in v]) for _c, v in books[j]]
        )
        for j in range(m)
    ]
    if not use_lut:
        recon = F.concat(
            *[
                F.element_at(book_lits[j], F.col(f"code_{j}") + 1)
                for j in range(m)
            ]
        )
        pairs = (
            codes.withColumnRenamed(id_col, "neighbor_id")
            .crossJoin(
                F.broadcast(
                    queries.select(
                        F.col(id_col).alias("query_id"),
                        F.col(vec_col).alias("qv"),
                    )
                )
            )
            .select(
                "query_id",
                "neighbor_id",
                F.round(cosine(F.col("qv"), recon), 4).alias("cos_sim"),
            )
        )
        return _ranked(pairs, k)

    # --- ADC with a per-query LUT (computed on the broadcast side) ---
    def _dot_to(s):
        # factory, NOT a default-arg lambda (2-arg HOF lambda trap)
        return lambda c: F.aggregate(
            F.zip_with(s, c, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    qsel = [F.col(id_col).alias("query_id")]
    for j in range(m):
        qsub = F.slice(F.col(vec_col), j * d_sub + 1, d_sub)
        qsel.append(F.transform(book_lits[j], _dot_to(qsub)).alias(f"lut_{j}"))
    qnorm = F.sqrt(
        F.aggregate(
            F.col(vec_col),
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )
    qsel.append(qnorm.alias("qnorm"))
    q_lut = queries.select(*qsel)

    # query-independent: |book_j[c]|² as plan literals (same
    # accumulation order as cosine()'s norm fold)
    norm2_lits = [
        F.array(
            *[
                F.lit(_fsum_sq(v))
                for _c, v in books[j]
            ]
        )
        for j in range(m)
    ]
    dot_expr = F.element_at(F.col("lut_0"), F.col("code_0") + 1)
    rnorm2 = F.element_at(norm2_lits[0], F.col("code_0") + 1)
    for j in range(1, m):
        dot_expr = dot_expr + F.element_at(
            F.col(f"lut_{j}"), F.col(f"code_{j}") + 1
        )
        rnorm2 = rnorm2 + F.element_at(norm2_lits[j], F.col(f"code_{j}") + 1)
    pairs = (
        codes.withColumnRenamed(id_col, "neighbor_id")
        .crossJoin(F.broadcast(q_lut))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot_expr / (F.col("qnorm") * F.sqrt(rnorm2)), 4
            ).alias("cos_sim"),
        )
    )
    return _ranked(pairs, k)


def _fsum_sq(v) -> float:
    """Sequential double accumulation of Σx² — same within-subspace
    fold order as cosine()'s norm aggregate (the cross-subspace
    grouping differs from a whole-vector fold by O(ulp); the 4-dp
    rounding both engines apply absorbs it)."""
    acc = 0.0
    for x in v:
        acc = acc + float(x) * float(x)
    return acc


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    m: int = 4,
    n_codes: int = 8,
    n_cells: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Full IVF-PQ: coarse cells + product-quantized RESIDUALS + ADC
    over probed cells — the textbook billion-vector index, composed
    from the engine's existing pieces:

    1. coarse quantizer (deterministic seed centroids), shuffle-free
       literal assignment;
    2. residual = vector − its cell centroid (a ``zip_with`` against
       the centroid literal — still one narrow pass);
    3. PQ codebooks trained on residuals, residual encode (narrow);
    4. queries probe ``n_probe`` nearest cells; candidates are scored
       by cosine(query, cell_centroid + residual_reconstruction) —
       candidates ≈ corpus · n_probe / n_cells, each touched via its
       m codes + plan literals, never its raw vector.

    At 10^10 vectors the scored representation is (cell_id, m codes) ≈
    a few bytes/vector; recall < 1 by design (probe subset + quantized
    residuals); determinism from seeded centroids and (rounded sim,
    id) ranking."""
    coarse = kmeans_centroids(
        corpus, n_cells, id_col, vec_col, n_steps=0
    )
    assigned = _assign_to_cents(corpus, coarse, id_col, vec_col)
    cent_lit = F.array(
        *[F.array(*[F.lit(float(x)) for x in v]) for _c, v in coarse]
    )
    cvec = F.element_at(cent_lit, F.col("cell_id") + 1)
    resid = F.zip_with(
        F.col(vec_col), cvec, lambda x, y: x.cast("double") - y
    )
    res_corpus = assigned.select(
        F.col(id_col), F.col("cell_id"), resid.alias(vec_col)
    )
    books = pq_train(res_corpus, dim, m, n_codes, id_col, vec_col)
    codes = pq_encode(res_corpus, books, id_col, vec_col).join(
        assigned.select(id_col, "cell_id"), id_col
    )

    cents_df = F.broadcast(
        corpus.sparkSession.createDataFrame(
            [(c, v) for c, v in coarse], "cell_id int, centroid array<double>"
        )
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    q_cells = q.crossJoin(cents_df).select(
        "query_id", "qv", "cell_id",
        cosine(F.col("qv"), F.col("centroid")).alias("_sim"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.desc("_sim"), F.asc("cell_id")
    )
    probes = (
        q_cells.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= n_probe)
        .select("query_id", "qv", "cell_id")
    )
    recon_res = F.concat(
        *[
            F.element_at(
                F.array(
                    *[
                        F.array(*[F.lit(float(x)) for x in v])
                        for _c, v in books[j]
                    ]
                ),
                F.col(f"code_{j}") + 1,
            )
            for j in range(m)
        ]
    )
    recon = F.zip_with(cvec, recon_res, lambda a, b: a + b)
    cands = probes.join(
        codes.withColumnRenamed(id_col, "neighbor_id"), "cell_id"
    )
    pairs = cands.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), recon), 4).alias("cos_sim"),
    ).distinct()
    return _ranked(pairs, k)


def ann_recall(
    exact: DataFrame, approx: DataFrame, k: int
) -> DataFrame:
    """Recall@k of an ANN strategy against the exact brute-force
    baseline — the standard quality dial for every approximate index
    here (IVF probe count, PQ codebook size, LSH bucket width trade
    recall for scan fraction; this operator measures what a setting
    actually buys).

    Both inputs are top-k result tables in this module's common shape
    ``(query_id, neighbor_id, cos_sim, rank)`` (any extra columns are
    ignored). Per query: ``n_hits`` = |approx ∩ exact| on neighbor_id,
    ``recall_bp`` = basis points of k recovered, exact integer
    arithmetic (``n_hits * 10000 div k``) so the evaluation itself is
    engine-portable and value-hashable. Queries the approximate index
    returned nothing for still appear (n_hits 0): the anchor is the
    exact side's query set.

    Scale: one semi join on (query_id, neighbor_id) — both sides are
    |queries|·k rows, NOT corpus-sized (the expensive part already
    happened inside the two top-k scans) — plus one map-side-combinable
    count. At a million queries this is a pair of small keyed shuffles;
    nothing touches the corpus or the raw vectors."""
    if k <= 0:
        raise ValueError(f"ann_recall: k must be positive, got {k}")
    # distinct: a non-distinct approx input (duplicate (query_id,
    # neighbor_id) rows) would double-count hits and push recall_bp
    # past 10000 (ADVICE r5)
    hits = approx.select("query_id", "neighbor_id").distinct().join(
        exact.select("query_id", "neighbor_id"),
        ["query_id", "neighbor_id"],
        "left_semi",
    )
    per_q = hits.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    anchor = exact.select("query_id").distinct()
    n = F.coalesce(F.col("n_hits"), F.lit(0))
    return anchor.join(per_q, "query_id", "left").select(
        "query_id",
        n.cast("long").alias("n_hits"),
        F.expr(
            f"CAST((coalesce(n_hits, 0) * 10000) DIV {int(k)} AS BIGINT)"
        ).alias("recall_bp"),
    )
