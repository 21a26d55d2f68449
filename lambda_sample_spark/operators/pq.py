"""Product quantization for similarity search (SURVEY.md §2.8 X3 — the
memory-scale path). PQ (Jégou, Douze, Schmid, "Product Quantization
for Nearest Neighbor Search", TPAMI 2011) splits a D-dim vector into
M subvectors, quantizes each against its own ks-entry codebook, and
stores M small codes per vector: 64-dim float64 -> 8 bytes at the
default (M=8, ks=256), a 64x compression. Search is asymmetric
distance computation (ADC): per query, one (M x ks) lookup table of
subspace dot products; a candidate's approximate score is M table
lookups summed — no float math per candidate, no decompression.

This is what makes billion-vector corpora tractable: at 100 TB of raw
embeddings, the PQ codes are ~1.6 TB — RAM-resident across a modest
cluster — and the exact vectors are only touched to re-rank the
handful of ADC survivors (the refine step). Composition with the IVF
router (similarity.ivf_index) gives IVF-PQ, the FAISS workhorse
layout: cells prune WHICH codes to scan, PQ makes the scan cheap.

Spark shapes: codebook training is driver-side numpy over a bounded
sample (the coarse-quantizer economics — see similarity.ivf_index);
encoding is ONE vectorized mapper over broadcast codebooks (no
shuffle); ADC scanning is one mapper over the codes emitting
per-partition top-k, merged by a tiny window; only the refine join
reads raw vectors, by id. The contract row (q_pq_adc_topk) runs the
whole ADC pipeline RELATIONALLY — codebook, encode-argmin, LUT, and
score as DataFrame joins with engine-exact decimal sums — so DuckDB
replays it bit-for-bit; production paths use the numpy fast lane.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — resolves pandas_udf type hints

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.vectors import as_double
from .common import embeddings

PQ_M = 8  # subspaces
PQ_KS = 256  # codebook entries per subspace (a byte per code)
PQ_FIT_CAP = 131_072  # max vectors collected for codebook training


def _fit_kmeans_np(mat, k: int, max_iter: int = 12, seed: int = 7):
    """Seeded plain-euclidean Lloyd with k-means++ init over a
    driver-side sample — the subspace codebook trainer. (PQ codebooks
    live in subvector space where vectors are NOT unit; spherical
    k-means would be the wrong geometry.) Empty cells reseed with the
    points farthest from their assigned centroid."""
    import numpy as np

    rng = np.random.default_rng(seed)
    mat = np.asarray(mat, dtype=np.float64)
    n = mat.shape[0]
    k = max(1, min(k, n))
    first = int(rng.integers(n))
    chosen = [first]
    d2 = ((mat - mat[first]) ** 2).sum(axis=1)
    for _ in range(1, k):
        total = d2.sum()
        probs = d2 / total if total > 0 else np.full(n, 1.0 / n)
        j = int(rng.choice(n, p=probs))
        chosen.append(j)
        np.minimum(d2, ((mat - mat[j]) ** 2).sum(axis=1), out=d2)
    cents = mat[chosen].copy()
    x2 = (mat**2).sum(axis=1)
    for _ in range(max_iter):
        # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2 — one BLAS matmul,
        # no (n, k, ds) difference tensor (the naive broadcast form
        # cost ~100s and ~0.5 GB of temporaries at a 131k-row sample)
        d = x2[:, None] - 2.0 * (mat @ cents.T) + (cents**2).sum(axis=1)
        assign = d.argmin(axis=1)
        newc = np.zeros_like(cents)
        np.add.at(newc, assign, mat)
        counts = np.bincount(assign, minlength=k)
        empty = counts == 0
        newc[~empty] /= counts[~empty, None]
        if empty.any():
            far = np.argsort(-d[np.arange(n), assign])
            newc[empty] = mat[far[: int(empty.sum())]]
        if np.allclose(newc, cents, atol=1e-12):
            cents = newc
            break
        cents = newc
    return cents


def pq_train(
    emb: DataFrame,
    m: int = PQ_M,
    ks: int = PQ_KS,
    fit_cap: int = PQ_FIT_CAP,
    vec_col: str = "vec",
):
    """Train the M per-subspace codebooks on a bounded driver sample;
    returns a numpy array of shape (m, ks', ds) with ks' <= ks (fewer
    when the sample is small). D must divide evenly by m."""
    import numpy as np

    sample = np.asarray(
        [r[0] for r in emb.select(vec_col).limit(fit_cap).collect()],
        dtype=np.float64,
    )
    dim = sample.shape[1]
    assert dim % m == 0, f"dim {dim} not divisible by m={m}"
    ds = dim // m
    ks_eff = max(1, min(ks, sample.shape[0]))
    books = np.stack(
        [
            _fit_kmeans_np(sample[:, i * ds : (i + 1) * ds], ks_eff, seed=7 + i)
            for i in range(m)
        ]
    )
    return books


def pq_encode(
    emb: DataFrame, books, vec_col: str = "vec", id_col: str = "vec_id"
) -> DataFrame:
    """One vectorized mapper over broadcast codebooks: each vector ->
    its M nearest-codeword indices. Returns (id, codes ARRAY<INT>) —
    conceptually M bytes/vector; the array encoding keeps the contract
    schema plain (a production table would pack them into BINARY)."""
    from pyspark.sql.functions import pandas_udf

    bc = emb.sparkSession.sparkContext.broadcast(books)

    @pandas_udf("array<int>")
    def enc(vecs: pd.Series) -> pd.Series:
        import numpy as np
        import pandas as _pd

        b = bc.value  # (m, ks, ds)
        if len(vecs) == 0:
            return _pd.Series([], dtype=object)
        mat = np.array(vecs.tolist(), dtype=np.float64)
        m, ks, ds = b.shape
        codes = np.empty((mat.shape[0], m), dtype=np.int32)
        for i in range(m):
            sub = mat[:, i * ds : (i + 1) * ds]
            # argmin ||x - c||^2 = argmax (2 x.c - ||c||^2)
            scores = 2.0 * (sub @ b[i].T) - (b[i] ** 2).sum(axis=1)
            codes[:, i] = scores.argmax(axis=1)
        return _pd.Series(list(codes))

    return emb.select(F.col(id_col), enc(F.col(vec_col)).alias("codes"))


def pq_adc_topk(
    encoded: DataFrame,
    queries,
    books,
    top_k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC scan: approximate dot(q, v) = sum over subspaces of
    LUT[m][code_m(v)]. ``queries`` is a list of (q_id, vector). One
    mapper over the codes emits each PARTITION's top-k per query
    (bounded output: partitions x queries x k rows), then a tiny
    window takes the global top-k — the raw corpus never shuffles.
    Returns (q_id, c_id, adc_score, rank)."""
    import numpy as np

    q_ids = [int(q) for q, _ in queries]
    qmat = np.asarray([v for _, v in queries], dtype=np.float64)
    m, ks, ds = books.shape
    # (m, Q, ks): per-subspace dot of every query against every codeword
    luts = np.stack(
        [qmat[:, i * ds : (i + 1) * ds] @ books[i].T for i in range(m)]
    )
    spark = encoded.sparkSession
    bc = spark.sparkContext.broadcast((q_ids, luts))

    def scan(batches):
        import pandas as _pd

        qids, lut = bc.value  # lut: (m, Q, ks)
        # running per-PARTITION top-k per query, merged across the
        # batch iterator so the partial output is truly bounded by
        # partitions x queries x k (not batches x queries x k)
        best_ids = [np.empty(0, dtype=np.int64) for _ in qids]
        best_scores = [np.empty(0) for _ in qids]
        for pdf in batches:
            if pdf.empty:
                continue
            codes = np.array(pdf["codes"].tolist(), dtype=np.int64)  # (B, m)
            # scores (Q, B): sum over m of lut[m, :, codes[:, m]]
            scores = np.zeros((lut.shape[1], codes.shape[0]))
            for i in range(lut.shape[0]):
                scores += lut[i][:, codes[:, i]]
            ids = pdf[id_col].to_numpy()
            for qi, q in enumerate(qids):
                # self-exclusion BEFORE the prune (the query's own row
                # scores highest and would displace a real candidate),
                # then prune under the SAME total order the global
                # window uses — (score desc, id asc) — so tied scores
                # at the k boundary (duplicate vectors have identical
                # codes) keep exactly the ids the global top-k keeps
                # (prefix property of a total order)
                mask = ids != q
                cand_ids = np.concatenate([best_ids[qi], ids[mask]])
                cand_scores = np.concatenate([best_scores[qi], scores[qi][mask]])
                k = min(top_k, cand_ids.shape[0])
                keep = np.lexsort((cand_ids, -cand_scores))[:k]
                best_ids[qi], best_scores[qi] = cand_ids[keep], cand_scores[keep]
        if any(b.size for b in best_ids):
            yield _pd.concat(
                [
                    _pd.DataFrame(
                        {"q_id": q, "c_id": best_ids[qi], "adc_score": best_scores[qi]}
                    )
                    for qi, q in enumerate(qids)
                ],
                ignore_index=True,
            )

    partial = encoded.mapInPandas(
        scan, "q_id BIGINT, c_id BIGINT, adc_score DOUBLE"
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("adc_score").desc(), F.col("c_id")
    )
    return (
        partial.where(F.col("c_id") != F.col("q_id"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
    )


def _train_residual_books(assigned, cmat, crow: dict, m: int, ks: int):
    """Codebooks over residual samples r = unit(v) - centroid: the
    coarse cell absorbs between-cluster variance, so the codes spend
    entirely on within-cell detail (Jégou et al. §IV). Driver-side
    over a bounded sample, like every quantizer fit here."""
    import numpy as np

    # codebook quality saturates around ~1k samples/codeword (the
    # FAISS training economics); collecting more only pays driver
    # transfer cost
    cap = min(PQ_FIT_CAP, ks * 1024)
    sample = assigned.select("unit", "cluster").limit(cap).collect()
    smat = np.asarray([r["unit"] for r in sample], dtype=np.float64)
    srow = np.asarray([crow[r["cluster"]] for r in sample])
    X = smat - cmat[srow]
    dim = X.shape[1]
    assert dim % m == 0, f"dim {dim} not divisible by m={m}"
    ds = dim // m
    ks_eff = max(1, min(ks, X.shape[0]))
    return np.stack(
        [_fit_kmeans_np(X[:, i * ds : (i + 1) * ds], ks_eff, seed=7 + i)
         for i in range(m)]
    )


def _encode_residual(assigned, books, cmat, crow: dict):
    """One vectorized mapper: unit(v) - centroid[cluster] -> M codes.
    Returns (vec_id, cluster, codes)."""
    from pyspark.sql.functions import pandas_udf

    spark = assigned.sparkSession
    bc_enc = spark.sparkContext.broadcast((books, cmat, crow))

    @pandas_udf("array<int>")
    def enc_resid(units: pd.Series, clusters: pd.Series) -> pd.Series:
        import numpy as _np
        import pandas as _pd

        b, cm, cr = bc_enc.value
        if len(units) == 0:
            return _pd.Series([], dtype=object)
        mat = _np.array(units.tolist(), dtype=_np.float64)
        mat -= cm[clusters.map(cr).to_numpy()]
        mm, kk, dd = b.shape
        codes = _np.empty((mat.shape[0], mm), dtype=_np.int32)
        for i in range(mm):
            sub = mat[:, i * dd : (i + 1) * dd]
            sc = 2.0 * (sub @ b[i].T) - (b[i] ** 2).sum(axis=1)
            codes[:, i] = sc.argmax(axis=1)
        return _pd.Series(list(codes))

    return assigned.select(
        "vec_id", "cluster", enc_resid("unit", "cluster").alias("codes")
    )


def _probe_cells(queries, cmat, ckeys, nprobe: int, with_dots: bool):
    """(q_id, cluster, qc_dot) probe rows: each query's nprobe nearest
    centroids, with the dot(q_unit, centroid) term when residual ADC
    needs it (0.0 otherwise)."""
    import numpy as np

    rows = []
    for q_id, vec in queries:
        qv = np.asarray(vec, dtype=np.float64)
        nrm = np.linalg.norm(qv)
        qu = qv / (nrm if nrm > 0 else 1.0)
        dots = cmat @ qu
        order = np.argsort(-dots)[:nprobe]
        rows.extend(
            (int(q_id), int(ckeys[i]), float(dots[i]) if with_dots else 0.0)
            for i in order
        )
    return rows


def _adc_scored(cand_codes: DataFrame, queries, books, unit_queries: bool):
    """ADC scoring mapper over (vec_id, codes, q_id, qc_dot) candidate
    rows -> (q_id, c_id, adc_score), self-pairs excluded. With
    ``unit_queries`` the LUTs are built from normalized queries so the
    qc_dot + LUT decomposition reconstructs cosine (residual mode)."""
    import numpy as np

    ds = books.shape[2]
    qmat = np.asarray([v for _, v in queries], dtype=np.float64)
    if unit_queries:
        qn = np.linalg.norm(qmat, axis=1, keepdims=True)
        qmat = qmat / np.where(qn == 0, 1.0, qn)
    q_index = {int(q): i for i, (q, _) in enumerate(queries)}
    luts = np.stack(
        [qmat[:, i * ds : (i + 1) * ds] @ books[i].T for i in range(books.shape[0])]
    )
    bc = cand_codes.sparkSession.sparkContext.broadcast((q_index, luts))

    def score(batches):
        import numpy as _np
        import pandas as _pd

        qidx, lut = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            codes = _np.array(pdf["codes"].tolist(), dtype=_np.int64)
            qrows = pdf["q_id"].map(qidx).to_numpy()
            s = pdf["qc_dot"].to_numpy().astype(float).copy()
            for i in range(lut.shape[0]):
                s += lut[i][qrows, codes[:, i]]
            yield _pd.DataFrame(
                {"q_id": pdf["q_id"], "c_id": pdf["vec_id"], "adc_score": s}
            )

    return cand_codes.mapInPandas(
        score, "q_id BIGINT, c_id BIGINT, adc_score DOUBLE"
    ).where(F.col("c_id") != F.col("q_id"))


def _refine_exact_topk(
    scored: DataFrame, vecs: DataFrame, queries, top_k: int, refine: int
) -> DataFrame:
    """Keep the top refine*k ADC survivors per query, re-rank them by
    exact cosine against raw vectors joined BY ID, return
    (q_id, c_id, cos_sim, rank). ``vecs`` is a (c_id, vec) frame."""
    from ..functions.vectors import cosine

    wa = Window.partitionBy("q_id").orderBy(F.col("adc_score").desc(), F.col("c_id"))
    survivors = scored.withColumn("ar", F.row_number().over(wa)).where(
        F.col("ar") <= refine * top_k
    )
    qdf = scored.sparkSession.createDataFrame(
        [(int(q), [float(x) for x in v]) for q, v in queries],
        "q_id BIGINT, q_vec ARRAY<DOUBLE>",
    )
    refined = (
        survivors.join(vecs, "c_id")
        .join(F.broadcast(qdf), "q_id")
        .withColumn("cos_sim", cosine(F.col("q_vec"), F.col("vec")))
    )
    wr = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("c_id"))
    return (
        refined.withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= top_k)
        .select("q_id", "c_id", "cos_sim", "rank")
    )


def ivfpq_search(
    emb: DataFrame,
    queries,
    n: int | None = None,
    top_k: int = 10,
    refine: int = 4,
    m: int = PQ_M,
    ks: int = 64,
    residual: bool = True,
) -> DataFrame:
    """IVF-PQ with exact re-rank refinement — the FAISS workhorse
    shape. The IVF router picks each query's nprobe cells; the ADC
    scan scores ONLY those cells' codes; the top refine*k ADC
    survivors are re-ranked by exact cosine on raw vectors fetched BY
    ID. Per-query exact-math work is refine*k vectors regardless of
    corpus size; the codes (M bytes/vector) are the only thing scanned
    wide. Returns (q_id, c_id, cos_sim, rank).

    ``residual=True`` (default) quantizes r = unit(v) - centroid
    instead of the vector itself — the Jégou et al. §IV design: the
    coarse cell absorbs the between-cluster variance, so the M bytes
    spend entirely on the within-cell detail that actually ranks
    neighbors. ADC then scores dot(q, c) + sum(LUT[r-codes]) =
    dot(q, unit(v)) up to quantization — the dot(q, c) term is one
    number per (query, probed cell), computed driver-side with the
    centroids already in hand. Measured on the planted-cluster
    fixture at (m=8, ks=64) = 8 bytes/vector: raw 0.40 -> residual
    0.72 recall@10 before refinement — residual at 8 bytes ~ raw at
    16."""
    import math as _math

    import numpy as np

    from .similarity import IVF_MAX_CELLS, ivf_index, ivf_nprobe_for

    if n is None:
        n = emb.count()
    k_cells = max(4, min(int(_math.isqrt(n)), IVF_MAX_CELLS))
    nprobe = ivf_nprobe_for(k_cells)
    centroids, assigned = ivf_index(emb, k_cells)

    cents = {r["cluster"]: np.asarray(r["cvec"]) for r in centroids.collect()}
    ckeys = sorted(cents)
    cmat = np.stack([cents[c] for c in ckeys])
    crow = {c: i for i, c in enumerate(ckeys)}
    spark = emb.sparkSession

    if residual:
        books = _train_residual_books(assigned, cmat, crow, m, ks)
        encoded = _encode_residual(assigned, books, cmat, crow)
    else:
        books = pq_train(emb, m=m, ks=ks)
        encoded = pq_encode(assigned.select("vec_id", "vec", "cluster"), books).join(
            assigned.select("vec_id", "cluster"), "vec_id"
        )

    probed = spark.createDataFrame(
        _probe_cells(queries, cmat, ckeys, nprobe, with_dots=residual),
        "q_id BIGINT, cluster INT, qc_dot DOUBLE",
    )
    # ADC over the probed cells only: score rows where the candidate's
    # cell was probed FOR that query (the join already paired them)
    cand_codes = encoded.join(F.broadcast(probed), "cluster").select(
        "vec_id", "codes", "q_id", "qc_dot"
    )
    scored = _adc_scored(cand_codes, queries, books, unit_queries=residual)
    vecs = emb.select(F.col("vec_id").alias("c_id"), "vec")
    return _refine_exact_topk(scored, vecs, queries, top_k, refine)


# --- persisted IVF-PQ index -------------------------------------------


def ivfpq_write_index(
    emb: DataFrame,
    path: str,
    n: int | None = None,
    m: int = PQ_M,
    ks: int = 64,
) -> None:
    """Build and persist the full IVF-PQ index: cluster-partitioned
    cells holding (vec_id, vec, codes) — parquet's column pruning
    means the ADC scan reads ONLY the codes column and the refine
    join ONLY vec — plus the k-row centroid table and the codebook
    (m, code, subvec) alongside. At 100 TB the codes column is the
    RAM-resident ~1/64 slice; raw vectors stay on disk and are read
    by id for the refine survivors."""
    import math as _math

    import numpy as np

    from .similarity import IVF_MAX_CELLS, ivf_index

    if n is None:
        n = emb.count()
    k_cells = max(4, min(int(_math.isqrt(n)), IVF_MAX_CELLS))
    centroids, assigned = ivf_index(emb, k_cells)
    cents = {r["cluster"]: np.asarray(r["cvec"]) for r in centroids.collect()}
    ckeys = sorted(cents)
    cmat = np.stack([cents[c] for c in ckeys])
    crow = {c: i for i, c in enumerate(ckeys)}
    books = _train_residual_books(assigned, cmat, crow, m, ks)
    encoded = _encode_residual(assigned, books, cmat, crow)
    cells = assigned.select("vec_id", "vec", "cluster").join(
        encoded.select("vec_id", "codes"), "vec_id"
    )
    cells.write.mode("overwrite").partitionBy("cluster").parquet(f"{path}/cells")
    centroids.write.mode("overwrite").parquet(f"{path}/centroids")
    spark = emb.sparkSession
    book_rows = [
        (int(i), int(c), [float(x) for x in books[i, c]])
        for i in range(books.shape[0])
        for c in range(books.shape[1])
    ]
    spark.createDataFrame(
        book_rows, "m INT, code INT, subvec ARRAY<DOUBLE>"
    ).write.mode("overwrite").parquet(f"{path}/codebook")


def ivfpq_append_index(
    emb: DataFrame, path: str, batch_token: str | None = None
) -> None:
    """Incrementally extend a persisted IVF-PQ index with new vectors
    — the nightly-batch maintenance op. Coarse centroids and residual
    codebooks stay FROZEN (the FAISS steady-state practice: retrain
    only on periodic full rebuilds); each new vector is assigned to
    its nearest cell and encoded against the existing books in ONE
    vectorized mapper, then appended to the cluster-partitioned cells
    — no shuffle, no touch of existing rows, probe-compatible by
    construction (the assignment + residual-encode math is the exact
    twin of ivf_index/_encode_residual, pinned by
    test_pq.test_append_reencodes_identically). Work is linear in the
    batch, independent of index size.

    ``batch_token`` makes the append REPLAY-SAFE (a retried nightly
    batch must not duplicate vectors): the batch stages under
    ``_append_scratch/<token>`` (reused, not rewritten, once its
    _SUCCESS exists — Spark part filenames are per-attempt UUIDs, so a
    rewrite would break publish idempotence), publishes by hardlinking
    each staged file into the cells partitions under its staged name
    (an already-linked name is skipped), then stamps
    ``_appended/<token>``. Every crash window converges on retry:
    before _SUCCESS -> restage; mid-publish -> re-link the same
    inodes; after the marker -> no-op. Without a token the behavior is
    the plain one-shot append."""
    import numpy as np

    spark = emb.sparkSession
    cent_rows = spark.read.parquet(f"{path}/centroids").collect()
    cents = {r["cluster"]: np.asarray(r["cvec"]) for r in cent_rows}
    ckeys = np.asarray(sorted(cents))
    cmat = np.stack([cents[c] for c in ckeys])
    brows = spark.read.parquet(f"{path}/codebook").collect()
    m = 1 + max(r["m"] for r in brows)
    ks = 1 + max(r["code"] for r in brows)
    books = np.zeros((m, ks, len(brows[0]["subvec"])))
    for r in brows:
        books[r["m"], r["code"]] = r["subvec"]
    bc = spark.sparkContext.broadcast((cmat, ckeys, books))

    def run(batches):
        import numpy as _np
        import pandas as _pd

        cm, ck, b = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            mat = _np.array(pdf["vec"].tolist(), dtype=_np.float64)
            nrm = _np.linalg.norm(mat, axis=1, keepdims=True)
            nrm[nrm == 0] = 1.0
            unit = mat / nrm
            idx = (unit @ cm.T).argmax(axis=1)
            res = unit - cm[idx]
            mm, kk, dd = b.shape
            codes = _np.empty((mat.shape[0], mm), dtype=_np.int32)
            for i in range(mm):
                sub = res[:, i * dd : (i + 1) * dd]
                sc = 2.0 * (sub @ b[i].T) - (b[i] ** 2).sum(axis=1)
                codes[:, i] = sc.argmax(axis=1)
            yield _pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "vec": pdf["vec"],
                    "codes": list(codes),
                    "cluster": ck[idx],
                }
            )

    out = emb.select("vec_id", "vec").mapInPandas(
        run, "vec_id BIGINT, vec ARRAY<DOUBLE>, codes ARRAY<INT>, cluster INT"
    )
    if batch_token is None:
        out.write.mode("append").partitionBy("cluster").parquet(f"{path}/cells")
        return

    import os
    import shutil

    marker = os.path.join(path, "_appended", batch_token)
    scratch = os.path.join(path, "_append_scratch", batch_token)
    if os.path.exists(marker):
        shutil.rmtree(scratch, ignore_errors=True)
        return
    if not os.path.exists(os.path.join(scratch, "_SUCCESS")):
        out.write.mode("overwrite").partitionBy("cluster").parquet(scratch)
    for d in os.listdir(scratch):
        if not d.startswith("cluster="):
            continue
        dst_dir = os.path.join(path, "cells", d)
        os.makedirs(dst_dir, exist_ok=True)
        for fname in os.listdir(os.path.join(scratch, d)):
            if fname.startswith((".", "_")):
                continue
            try:
                os.link(
                    os.path.join(scratch, d, fname),
                    os.path.join(dst_dir, fname),
                )
            except FileExistsError:
                pass
    os.makedirs(os.path.dirname(marker), exist_ok=True)
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        f.write(batch_token)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, marker)
    shutil.rmtree(scratch, ignore_errors=True)


def ivfpq_probe_index(
    spark: SparkSession,
    path: str,
    queries,
    nprobe: int | None = None,
    top_k: int = 10,
    refine: int = 4,
) -> DataFrame:
    """Probe a persisted IVF-PQ index: cell selection on the broadcast
    centroid table; the cells scan carries the probed cluster set as a
    PARTITION filter (pruning IS candidate selection, the
    ivf_probe_index contract) and reads only the codes column; the
    refine join re-reads the SAME pruned partitions for just the
    survivors' vec column. ``queries`` is a list of (q_id, vector).
    Returns (q_id, c_id, cos_sim, rank)."""
    import numpy as np

    from .similarity import ivf_nprobe_for

    centroids = spark.read.parquet(f"{path}/centroids").collect()
    cents = {r["cluster"]: np.asarray(r["cvec"]) for r in centroids}
    ckeys = sorted(cents)
    cmat = np.stack([cents[c] for c in ckeys])
    if nprobe is None:
        nprobe = ivf_nprobe_for(len(ckeys))
    brows = spark.read.parquet(f"{path}/codebook").collect()
    m = 1 + max(r["m"] for r in brows)
    ks = 1 + max(r["code"] for r in brows)
    books = np.zeros((m, ks, len(brows[0]["subvec"])))
    for r in brows:
        books[r["m"], r["code"]] = r["subvec"]

    probe_rows = _probe_cells(queries, cmat, ckeys, nprobe, with_dots=True)
    probed = spark.createDataFrame(
        probe_rows, "q_id BIGINT, cluster INT, qc_dot DOUBLE"
    )
    clusters = sorted({c for _, c, _ in probe_rows})

    cells = spark.read.parquet(f"{path}/cells")
    cand_codes = (
        cells.where(F.col("cluster").isin(clusters))
        .select("vec_id", "codes", "cluster")
        .join(F.broadcast(probed), "cluster")
    )
    scored = _adc_scored(cand_codes, queries, books, unit_queries=True)
    # the refine scan re-reads only the SAME pruned partitions, and
    # only their vec column
    vecs = cells.where(F.col("cluster").isin(clusters)).select(
        F.col("vec_id").alias("c_id"), "vec"
    )
    return _refine_exact_topk(scored, vecs, queries, top_k, refine)


# --- contract row: the relational ADC twin -----------------------------

_C_M = 8  # subspaces over the 64-dim corpus vectors
_C_DS = 8  # dims per subspace
_C_KS = 32  # codebook entries: the first 32 corpus vectors' subvectors
_C_QUERIES = 5
_C_TOPK = 10


def _chain(terms):
    expr = terms[0]
    for t in terms[1:]:
        expr = expr + t
    return expr


def q_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract (tail, round-8 promotion): the full PQ-ADC pipeline as
    RELATIONAL operators, hash-checked against DuckDB. The codebook is
    deterministic (subspace m's entries = the first 32 corpus vectors'
    m-th subvectors), so both engines derive codebook, per-subspace
    argmin encoding, query LUTs, and ADC top-k from the data alone. All
    distance/dot expressions are explicit left-associated 8-term
    chains (bit-identical in any engine); the per-candidate ADC sum —
    the one order-sensitive accumulation — is summed in exact DECIMAL,
    so the ranking is engine-independent. Production callers use the
    numpy lane (pq_train/pq_encode/pq_adc_topk), property-tested
    against exact search; this row pins the ADC *semantics*."""
    emb = embeddings(spark, sf_dir).select(
        "vec_id", as_double(F.col("embedding")).alias("vec")
    )
    ms = F.explode(F.sequence(F.lit(0), F.lit(_C_M - 1))).alias("m")
    cb = emb.where(F.col("vec_id") < _C_KS).select(
        F.col("vec_id").cast("int").alias("code"), F.col("vec").alias("cbvec"), ms
    )

    def sub_d2(vec_col, cb_col):
        terms = []
        for i in range(1, _C_DS + 1):
            idx = F.col("m") * _C_DS + i
            d = F.element_at(vec_col, idx) - F.element_at(cb_col, idx)
            terms.append(d * d)
        return _chain(terms)

    pairs = emb.select("vec_id", "vec", ms).join(F.broadcast(cb), "m")
    wenc = Window.partitionBy("vec_id", "m").orderBy(F.col("d2"), F.col("code"))
    encoded = (
        pairs.withColumn("d2", sub_d2(F.col("vec"), F.col("cbvec")))
        .withColumn("rk", F.row_number().over(wenc))
        .where(F.col("rk") == 1)
        .select("vec_id", "m", "code")
    )

    def sub_dot(q_col, cb_col):
        terms = []
        for i in range(1, _C_DS + 1):
            idx = F.col("m") * _C_DS + i
            terms.append(F.element_at(q_col, idx) * F.element_at(cb_col, idx))
        return _chain(terms)

    q = emb.where(F.col("vec_id") < _C_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("vec").alias("q_vec"), ms
    )
    lut = q.join(F.broadcast(cb), "m").select(
        "q_id",
        "m",
        "code",
        sub_dot(F.col("q_vec"), F.col("cbvec")).cast("decimal(25,12)").alias("partial"),
    )
    scores = (
        encoded.join(F.broadcast(lut), ["m", "code"])
        .groupBy("q_id", F.col("vec_id").alias("c_id"))
        .agg(F.sum("partial").alias("score"))
        .where(F.col("c_id") != F.col("q_id"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("c_id"))
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= _C_TOPK)
        .select(
            "q_id",
            "c_id",
            F.col("rank").cast("int").alias("rank"),
            F.col("score").cast("double").alias("adc_score"),
        )
    )


def _pq_oracle() -> str:
    d2_terms = " + ".join(
        f"((e.vec[m.m*{_C_DS}+{i}] - c.cbvec[m.m*{_C_DS}+{i}])"
        f" * (e.vec[m.m*{_C_DS}+{i}] - c.cbvec[m.m*{_C_DS}+{i}]))"
        for i in range(1, _C_DS + 1)
    )
    dot_terms = " + ".join(
        f"(q.q_vec[m.m*{_C_DS}+{i}] * c.cbvec[m.m*{_C_DS}+{i}])"
        for i in range(1, _C_DS + 1)
    )
    return f"""
WITH emb AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
), m AS (
  SELECT unnest(range(0, {_C_M})) AS m
), cb AS (
  SELECT CAST(vec_id AS INT) AS code, vec AS cbvec
  FROM emb WHERE vec_id < {_C_KS}
), enc AS (
  SELECT vec_id, m, code FROM (
    SELECT e.vec_id, m.m AS m, c.code,
           row_number() OVER (
             PARTITION BY e.vec_id, m.m
             ORDER BY {d2_terms}, c.code
           ) AS rk
    FROM emb e CROSS JOIN m JOIN cb c ON TRUE
  ) WHERE rk = 1
), lut AS (
  SELECT q.q_id, m.m AS m, c.code,
         CAST({dot_terms} AS DECIMAL(25,12)) AS partial
  FROM (SELECT vec_id AS q_id, vec AS q_vec
        FROM emb WHERE vec_id < {_C_QUERIES}) q
  CROSS JOIN m JOIN cb c ON TRUE
), sc AS (
  SELECT l.q_id, e.vec_id AS c_id, sum(l.partial) AS score
  FROM enc e JOIN lut l ON e.m = l.m AND e.code = l.code
  WHERE e.vec_id != l.q_id
  GROUP BY 1, 2
)
SELECT q_id, c_id, CAST(rank AS INT) AS rank,
       CAST(score AS DOUBLE) AS adc_score
FROM (
  SELECT q_id, c_id, score,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY score DESC, c_id) AS rank
  FROM sc
) WHERE rank <= {_C_TOPK}
"""


ORACLE = {"q_pq_adc_topk": _pq_oracle()}

QUERIES: dict = {}

QUERIES_TAIL = {"q_pq_adc_topk": q_pq_adc_topk}
