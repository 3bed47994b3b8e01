#!/usr/bin/env python
"""Round-7 optimization harness (guide §1): per-lane isolation with the noop
sink + `.explain("formatted")` capture for plans/r07/.

bench.py is FROZEN for measurement; this file exists so the optimization
round can (a) time each lane's computation without the count() sink and
with job labels, and (b) dump plan shapes before/after each change.

Usage:
    python bench_extra.py explain <tag>       # writes plans/r07/<lane>_<tag>.txt
    python bench_extra.py time [lane ...]     # noop-sink timings (best of 2)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from openpoiservice_spark import cells as C  # noqa: E402
from openpoiservice_spark import derive as D  # noqa: E402
from openpoiservice_spark import geo as G  # noqa: E402
from openpoiservice_spark import knn as K  # noqa: E402
from openpoiservice_spark import prepare as P  # noqa: E402
from openpoiservice_spark import tiles as TI  # noqa: E402
from openpoiservice_spark import batchjoin as BJ  # noqa: E402
from openpoiservice_spark.functions import (cell_parent_sql, isin_expr,  # noqa: E402
                                            make_refine_udf)
from openpoiservice_spark.operators import ann as ANN  # noqa: E402
from openpoiservice_spark.operators import curation as CU  # noqa: E402
from openpoiservice_spark.operators import images as IM  # noqa: E402
from openpoiservice_spark.operators import text as TX  # noqa: E402
from openpoiservice_spark.session import get_spark  # noqa: E402

import bench  # noqa: E402  (frozen; reused for ensure_prepared only)


def build_lanes(spark, sf_dir):
    """Mirror bench.run_queries lane bodies, but RETURN DataFrames."""
    prepared, _ = bench.ensure_prepared(spark, sf_dir)
    pois = P.read_prepared(spark, prepared)

    line_spec = G.GeomSpec("linestring", D.LINE_Q)
    _res = 12
    cover = C.cover_geometry(line_spec, D.CORRIDOR_M, _res)
    pcover = np.unique(C.cell_parent(cover, C.PARTITION_RES)).tolist()
    qcell_sql = cell_parent_sql("cell", C.DEFAULT_RES, _res)
    refine = make_refine_udf(line_spec, D.CORRIDOR_M, None)
    _mnx, _mny, _mxx, _mxy = line_spec.buffered_bounds(D.CORRIDOR_M)
    corridor_range = (
        (F.col("lon") >= float(_mnx)) & (F.col("lon") <= float(_mxx))
        & (F.col("lat") >= float(_mny)) & (F.col("lat") <= float(_mxy))
    )

    def corridor_tiles():
        hits = (
            pois.filter(isin_expr("pcell", pcover))
            .filter(corridor_range)
            .filter(isin_expr(qcell_sql, cover.tolist()))
            .filter(refine(F.col("lon"), F.col("lat")))
            .select("osm_id", "lon", "lat", "w", "h")
        )
        return TI.tile_histogram(hits, 14)

    bbox_spec = G.bbox_spec(*D.BBOX_Q)
    bcover = C.cover_geometry(bbox_spec, 0.0, _res)
    brefine = make_refine_udf(bbox_spec, 0.0, None)

    def bbox_count():
        return (
            pois.filter(isin_expr(
                "pcell", np.unique(C.cell_parent(bcover, C.PARTITION_RES)).tolist()))
            .filter(isin_expr(qcell_sql, bcover.tolist()))
            .filter(brefine(F.col("lon"), F.col("lat")))
            .select("osm_id")
        )

    pt_spec = G.GeomSpec("point", [D.POINT_Q])
    rcover = C.cover_geometry(pt_spec, D.RADIUS_Q, _res)
    rrefine = make_refine_udf(pt_spec, D.RADIUS_Q, None)

    def radius_stats():
        return (
            pois.filter(isin_expr(
                "pcell", np.unique(C.cell_parent(rcover, C.PARTITION_RES)).tolist()))
            .filter(isin_expr(qcell_sql, rcover.tolist()))
            .filter(rrefine(F.col("lon"), F.col("lat")))
            .select(F.explode("category_ids").alias("category"))
            .groupBy("category").count()
        )

    pcell_stats = P.load_pcell_stats(spark, prepared)

    def knn100():
        return K.knn(pois, D.POINT_Q[0], D.POINT_Q[1], 100,
                     pcell_rows=pcell_stats)

    def corridor_pixels():
        hits = TI.filter_payload(
            pois,
            meta_filter=lambda d: (
                d.filter(isin_expr("pcell", pcover))
                .filter(corridor_range)
                .filter(isin_expr(qcell_sql, cover.tolist()))
                .filter(refine(F.col("lon"), F.col("lat")))
            ),
            payload_prefilter=lambda d: d.filter(
                isin_expr("pcell", pcover)).filter(corridor_range),
        )
        return (
            TI.tile_pixel_stats(hits, 14)
            .groupBy("tx", "ty").agg(F.sum("sum_intensity"))
        )

    def tile_heatmaps_z10():
        return TI.tile_heatmaps(pois.select("lon", "lat"), z=10)

    def image_phash_dedup():
        sample = pois.sample(0.02, seed=3).select("image_id", "bytes", "fmt")
        hashed = IM.dct_phash(sample)
        return IM.hamming_pairs(hashed, col="dct_phash", key="image_id",
                                max_dist=3, max_bucket=10_000)

    bj_items = []
    rng = np.random.default_rng(31)
    for gid in range(200):
        w = 0.05 + 0.45 * float(rng.random())
        h = 0.03 + 0.25 * float(rng.random())
        x1 = 7.5 + (6.5 - w) * float(rng.random())
        y1 = 52.0 + (2.0 - h) * float(rng.random())
        bj_items.append((gid, G.bbox_spec(x1, y1, x1 + w, y1 + h), 0.0))
    bj_gdf = BJ.geoms_to_df(spark, bj_items)

    def batch_join_200():
        return BJ.batch_join_counts(
            pois.select(F.col("osm_id").alias("poi_id"), "lon", "lat"),
            bj_gdf, res=12)

    knn_rng = np.random.default_rng(53)
    kq_df = spark.createDataFrame(pd.DataFrame({
        "query_id": np.arange(500, dtype=np.int64),
        "qlon": 7.6 + 6.3 * knn_rng.random(500),
        "qlat": 52.05 + 1.9 * knn_rng.random(500),
    }), BJ.KNN_QUERY_SCHEMA)

    def batch_knn_500():
        return BJ.batch_knn(
            pois.select(F.col("osm_id").alias("poi_id"), "lon", "lat"),
            kq_df, k=10, res=14, pcell_rows=pcell_stats)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    import pyarrow.parquet as _pq

    _n_emb = _pq.ParquetFile(
        os.path.join(sf_dir, "embeddings.parquet")).metadata.num_rows
    _ann_planes = ANN.hyperplanes(ANN.auto_planes(_n_emb, 64), 64, 13)
    _ann_queries = emb.select(F.col("vec_id").alias("query_id"),
                              F.col("embedding").alias("qvec"))

    return {
        "corridor_tiles": corridor_tiles,
        "bbox": bbox_count,
        "radius_stats": radius_stats,
        "knn_100": knn100,
        "corridor_pixels": corridor_pixels,
        "tile_heatmaps_z10": tile_heatmaps_z10,
        "image_phash_dedup": image_phash_dedup,
        "batch_join_200": batch_join_200,
        "batch_knn_500": batch_knn_500,
        "minhash_lsh": lambda: TX.lsh_candidate_pairs(docs),
        "minhash_lsh_xxh": lambda: TX.lsh_candidate_pairs(docs, hash_fn="xxhash64"),
        "near_dup_jaccard": lambda: TX.ngram_jaccard_pairs(docs),
        "doc_repetition": lambda: CU.repetition_signals(docs),
        "ann_brute_top10": lambda: ANN.brute_topk(emb, ANN.query_vector(), 10),
        "ann_batch_topk": lambda: ANN.batch_topk(emb, _ann_queries, k=10,
                                                 planes=_ann_planes),
    }


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app="opss-bench-extra", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    lanes = build_lanes(spark, sf_dir)

    if mode == "explain":
        tag = sys.argv[2]
        only = sys.argv[3:]
        outdir = os.path.join(REPO, "plans", "r07")
        os.makedirs(outdir, exist_ok=True)
        for name, fn in lanes.items():
            if only and name not in only:
                continue
            df = fn()
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as f:
                f.write(txt)
            print("wrote", name)
    else:
        only = sys.argv[2:]
        out = {}
        for name, fn in lanes.items():
            if only and name not in only:
                continue
            spark.sparkContext.setJobDescription(f"extra:{name}")
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                noop(fn())
                best = min(best, time.time() - t0)
            out[name] = round(best, 3)
            print(f"{name:22s} {best:7.3f}")
        print(out)
    spark.stop()


if __name__ == "__main__":
    main()
