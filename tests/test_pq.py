"""Product-quantization tier: encode/ADC parity vs numpy, trained-codebook
recall on clustered data, IVF+PQ composition, and plan shape (the ranking
scan over a pre-encoded table must be pure JVM expression work)."""
import numpy as np
import pytest
from pyspark.sql import functions as F

from openpoiservice_spark.operators import ann as ANN


def _rand_emb(spark, n=300, dim=64, seed=3):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, dim))
    rows = [(i, v.tolist()) for i, v in enumerate(x)]
    return x, spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _np_codes(x, cb):
    # the tier encodes UNIT vectors (cosine-metric PQ)
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    m, ks, dsub = cb.shape
    codes = np.empty((len(x), m), dtype=int)
    for j in range(m):
        sub = x[:, j * dsub:(j + 1) * dsub]
        d2 = ((sub[:, None, :] - cb[j][None, :, :]) ** 2).sum(axis=2)
        codes[:, j] = np.argmin(d2, axis=1)
    return codes


def _np_adc(codes, q, cb):
    m, ks, dsub = cb.shape
    q = np.asarray(q, dtype=np.float64)
    q = q / np.linalg.norm(q)
    lut = np.array([[np.dot(q[j * dsub:(j + 1) * dsub], cb[j][k])
                     for k in range(ks)] for j in range(m)])
    return np.array([sum(lut[j][c[j]] for j in range(m)) for c in codes])


def test_pq_encode_matches_numpy(spark):
    """pq_code_col's argmin-L2 (bias - 2*dot form, first-match tie-break)
    agrees element-for-element with a direct numpy PQ encoder."""
    x, emb = _rand_emb(spark)
    cb = ANN.pq_codebooks()
    got = {r.vec_id: list(r.codes)
           for r in ANN.pq_encode(emb, cb).collect()}
    ref = _np_codes(x, cb)
    assert all(got[i] == list(ref[i]) for i in range(len(x)))


def test_pq_topk_matches_numpy_adc(spark):
    """pq_topk's fused encode+ADC ranking equals the numpy LUT pipeline,
    including the (score desc, vec_id) tie order and 6-dp rounding."""
    x, emb = _rand_emb(spark, seed=4)
    cb = ANN.pq_codebooks()
    q = ANN.query_vector()
    adc = _np_adc(_np_codes(x, cb), q, cb)
    order = np.lexsort((np.arange(len(x)), -adc))[:10]
    got = ANN.pq_topk(emb, q, 10, cb).collect()
    assert [r.vec_id for r in got] == [int(i) for i in order]
    assert np.allclose([r.adc for r in got], np.round(adc[order], 6))


def test_pq_topk_codes_equals_fused(spark):
    """Ranking a pre-encoded (vec_id, codes) table — the production shape
    where the scan never reads vector bytes — returns exactly the fused
    path's answer."""
    _, emb = _rand_emb(spark, seed=5)
    cb = ANN.pq_codebooks()
    q = ANN.query_vector()
    codes = ANN.pq_encode(emb, cb)
    a = ANN.pq_topk(emb, q, 10, cb).collect()
    b = ANN.pq_topk_codes(codes, q, 10, cb).collect()
    assert [(r.vec_id, r.adc) for r in a] == [(r.vec_id, r.adc) for r in b]


def test_pq_trained_recall_clustered(spark):
    """Trained codebooks on clustered vectors (PQ's operating regime).
    ADC resolves structure ABOVE the quantization scale: every ADC top-10
    hit must come from the query's own cluster (coarse ranking is right),
    but ordering WITHIN a tight cluster sits below the quantization error
    — which is exactly why ivfpq_topk ends with an exact re-rank stage,
    asserted to recover the true cosine top-10."""
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(8, 64)) * 3
    x = np.stack([centers[i % 8] + rng.normal(size=64) * 0.3
                  for i in range(600)])
    emb = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(x)],
        "vec_id long, embedding array<double>")
    cb = ANN.pq_train(x[:300], m=8, ks=16, seed=11)
    q = x[123]
    got = [r.vec_id for r in ANN.pq_topk(emb, q, 10, cb).collect()]
    assert got and all(int(i) % 8 == 123 % 8 for i in got)

    # trained IVF + ADC shortlist + exact re-rank.  Seed-11 k-means happens
    # to split the query's cluster across THREE cells (two true top-10 hits
    # land in a cell outside the top-2 probes) — recall-vs-nprobe is the IVF
    # tradeoff, not an engine defect, so assert the actual contract twice:
    cent = ANN.ivf_train(x[:300], n_centroids=8, seed=11)
    brute = {r.vec_id for r in ANN.brute_topk(emb, q, 10).collect()}
    # (a) at nprobe=2 the composition returns EXACTLY the true cosine
    #     top-10 among REACHABLE vectors (those assigned to a probed cell)
    probe = set(np.argsort(-(cent @ q), kind="stable")[:2].tolist())
    cells = np.argmax(x @ cent.T, axis=1)
    cos = (x @ q) / (np.linalg.norm(x, axis=1) * np.linalg.norm(q))
    reach = [int(i) for i in np.argsort(-cos, kind="stable")
             if int(cells[i]) in probe][:10]
    got2 = {r.vec_id for r in
            ANN.ivfpq_topk(emb, q, 10, cent, cb, nprobe=2, shortlist=12).collect()}
    assert got2 == set(reach)
    # (b) one more probe covers the split cluster: true recall recovers
    got3 = {r.vec_id for r in
            ANN.ivfpq_topk(emb, q, 10, cent, cb, nprobe=3, shortlist=12).collect()}
    assert len(got3 & brute) >= 9


def test_ivfpq_full_probe_equals_brute(spark):
    """With every cell probed and a shortlist covering the table, the exact
    re-rank stage makes ivfpq_topk degrade to brute_topk exactly — the
    approximation lives only in the pruning stages."""
    _, emb = _rand_emb(spark, n=120, seed=6)
    cb = ANN.pq_codebooks()
    cent = ANN.ivf_centroids()
    q = ANN.query_vector()
    got = ANN.ivfpq_topk(emb, q, 10, cent, cb, nprobe=16, shortlist=12)
    brute = ANN.brute_topk(emb, q, 10)
    assert [(r.vec_id, r.cosine) for r in got.collect()] == \
           [(r.vec_id, r.cosine) for r in brute.collect()]


def test_ivfpq_candidates_respect_probe(spark):
    """Results come only from the probed IVF cells (directory pruning on a
    written table): every returned id's assigned cell is in the probe set."""
    x, emb = _rand_emb(spark, n=200, seed=7)
    cb = ANN.pq_codebooks()
    cent = ANN.ivf_centroids()
    q = ANN.query_vector()
    probe = set(np.argsort(-(cent @ q), kind="stable")[:2].tolist())
    got = ANN.ivfpq_topk(emb, q, 5, cent, cb, nprobe=2).collect()
    cells = {r.vec_id: r.cell for r in emb.select(
        "vec_id",
        ANN.ivf_assign_col(F.col("embedding"), cent).alias("cell")).collect()}
    assert got and all(cells[r.vec_id] in probe for r in got)


def test_pq_codes_plan_is_native(spark):
    """The compressed-table ranking plan: no Python evaluation anywhere
    (pure JVM array lookups + adds) and top-k via TakeOrderedAndProject,
    not a global sort."""
    _, emb = _rand_emb(spark, n=50, seed=8)
    cb = ANN.pq_codebooks()
    codes = ANN.pq_encode(emb, cb)
    plan = ANN.pq_topk_codes(codes, ANN.query_vector(), 5, cb) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "TakeOrderedAndProject" in plan


def test_pq_compression_ratio():
    """The memory story the tier exists for: m=8 one-byte-range codes per
    64-float vector is a >=32x cut (codes fit tinyint; even as parquet
    int32 the dictionary-encoded file is a fraction of the vector bytes)."""
    cb = ANN.pq_codebooks()
    m, ks, dsub = cb.shape
    assert m * dsub == 64 and ks <= 256  # codes representable in 1 byte
    assert (64 * 4) / m >= 32


def test_write_ivfpq_table_roundtrip(spark, tmp_path):
    """The written layout: partitioned by ivf_cell, codes column present,
    BOTH codebook sidecars readable, and the two-phase table read equals
    the in-memory composition on the same inputs."""
    _, emb = _rand_emb(spark, n=200, seed=9)
    cb = ANN.pq_codebooks()
    cent = ANN.ivf_centroids()
    path = str(tmp_path / "ivfpq")
    ANN.write_ivfpq_table(emb, path, cent, cb)
    assert np.allclose(ANN.read_codebook(spark, path), cent)
    assert np.allclose(ANN.read_pq_codebooks(spark, path), cb)

    q = ANN.query_vector()
    a = ANN.ivfpq_topk_table(spark, path, q, 10, nprobe=2, shortlist=4)
    b = ANN.ivfpq_topk(emb, q, 10, cent, cb, nprobe=2, shortlist=4)
    assert [(r.vec_id, r.cosine) for r in a.collect()] == \
           [(r.vec_id, r.cosine) for r in b.collect()]


def test_ivfpq_table_phase1_prunes_partitions(spark, tmp_path):
    """Phase 1's codes scan must hit only the probed ivf_cell directories
    (partition pruning) and must not read the embedding column."""
    _, emb = _rand_emb(spark, n=200, seed=10)
    cent = ANN.ivf_centroids()
    path = str(tmp_path / "ivfpq")
    ANN.write_ivfpq_table(emb, path, cent, ANN.pq_codebooks())
    q = ANN.query_vector()
    probe = [int(i) for i in np.argsort(-(cent @ q), kind="stable")[:2]]
    phase1 = (
        spark.read.parquet(path)
        .filter(F.col("ivf_cell").isin(probe))
        .select("vec_id", ANN.pq_adc_col(F.col("codes"), q,
                                         ANN.pq_codebooks()).alias("_adc"))
    )
    plan = phase1._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ivf_cell" in plan
    scan = plan[plan.index("ReadSchema"):]
    assert "embedding" not in scan.split("\n")[0]


def test_batch_ivfpq_matches_per_query(spark, tmp_path):
    """batch_topk_ivfpq_table (fill off) answers each query exactly as the
    single-query two-phase read does — one job instead of N plans."""
    _, emb = _rand_emb(spark, n=250, seed=12)
    cent = ANN.ivf_centroids()
    cb = ANN.pq_codebooks()
    path = str(tmp_path / "ivfpq")
    ANN.write_ivfpq_table(emb, path, cent, cb)
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"))
    got = ANN.batch_topk_ivfpq_table(spark, path, queries, 5,
                                     nprobe=2, shortlist=4, fill=False)
    rows = {}
    for r in got.collect():
        rows.setdefault(r.query_id, []).append((r.vec_id, r.cosine))
    qv = {r.query_id: list(r.qvec) for r in queries.collect()}
    for qid, v in qv.items():
        single = ANN.ivfpq_topk_table(spark, path, v, 5,
                                      nprobe=2, shortlist=4)
        assert sorted(rows.get(qid, [])) == \
            sorted((r.vec_id, r.cosine) for r in single.collect())


def test_batch_ivfpq_plan_no_cartesian(spark, tmp_path):
    """The batch candidate stage is ONE equi-join on the cell key — no
    CartesianProduct / BroadcastNestedLoopJoin anywhere in the plan."""
    _, emb = _rand_emb(spark, n=120, seed=13)
    path = str(tmp_path / "ivfpq")
    ANN.write_ivfpq_table(emb, path, ANN.ivf_centroids(), ANN.pq_codebooks())
    queries = emb.limit(5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"))
    df = ANN.batch_topk_ivfpq_table(spark, path, queries, 5, fill=False)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pq_recon_matches_numpy(spark):
    """pq_recon_col rebuilds exactly the concatenation of selected
    sub-centroids, and <q_unit, recon> equals the ADC LUT score."""
    x, emb = _rand_emb(spark, n=40, seed=14)
    cb = ANN.pq_codebooks()
    q = ANN.query_vector()
    codes = ANN.pq_encode(emb, cb)
    rec = codes.select(
        "vec_id", ANN.pq_recon_col(F.col("codes"), cb).alias("recon"))
    got = {r.vec_id: np.array(r.recon) for r in rec.collect()}
    ref_codes = _np_codes(x, cb)
    m, ks, dsub = cb.shape
    for i in range(len(x)):
        ref = np.concatenate([cb[j][ref_codes[i, j]] for j in range(m)])
        assert np.allclose(got[i], ref)
        qu = q / np.linalg.norm(q)
        assert abs(float(qu @ ref) - _np_adc(ref_codes[i:i + 1], q, cb)[0]) < 1e-9


def test_ivfpq_recall_full_probe_is_one(spark, tmp_path):
    """The compressed-tier quality loop (gate ann_recall_ivfpq) has a hard
    floor: probe ALL cells with an ADC shortlist covering the whole table
    and the exact re-rank IS brute force, so batch_recall must report 1.0
    for every query — any miss would be a composition bug, not an
    approximation artifact.  (Recall at small nprobe is data-dependent and
    asserted on clustered fixtures in test_pq_trained_recall_clustered.)"""
    _, emb = _rand_emb(spark, n=200, seed=14)
    cent = ANN.ivf_centroids()
    path = str(tmp_path / "ivfpq")
    ANN.write_ivfpq_table(emb, path, cent, ANN.pq_codebooks())
    queries = emb.filter(F.col("vec_id") % 40 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"))
    approx = ANN.batch_topk_ivfpq_table(spark, path, queries, 5,
                                        nprobe=len(cent), shortlist=40)
    exact = ANN.batch_topk_brute(emb, queries, 5)
    got = ANN.batch_recall(approx, exact, 5).collect()
    assert len(got) == queries.count()
    assert all(r.recall == 1.0 and r.n_hit == 5 for r in got)
