#!/usr/bin/env python
"""spark-submit entry point (north_rule: jobs launch via
`spark-submit --py-files` on multi-executor clusters).

Package the library once and submit any stage:

    zip -r opss.zip openpoiservice_spark
    spark-submit --py-files opss.zip jobs.py prepare \
        --raw s3://bucket/raw --prepared s3://bucket/prepared
    spark-submit --py-files opss.zip jobs.py pois \
        --prepared s3://bucket/prepared \
        --payload '{"request":"pois","geometry":{"bbox":[[8.80,53.07],[8.81,53.08]]}}'
    spark-submit --py-files opss.zip jobs.py tiles \
        --prepared s3://bucket/prepared --zoom 14 --out s3://bucket/tiles

Under spark-submit the session comes from the launcher; `getOrCreate`
attaches to it and only fills in engine defaults that are unset.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    p = argparse.ArgumentParser(prog="openpoiservice-spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("prepare", help="run the import pipeline")
    sp.add_argument("--raw", required=True)
    sp.add_argument("--prepared", required=True)
    sp.add_argument("--no-resume", action="store_true")
    sp.add_argument("--format", default="parquet", choices=("parquet", "jsonl", "csv"),
                    help="raw source format (jsonl/csv carry base64 payloads)")

    sq = sub.add_parser("pois", help="run a POI/stats request payload")
    sq.add_argument("--prepared", required=True)
    sq.add_argument("--payload", required=True, help="JSON request dict")
    sq.add_argument("--invalid-log", default=None,
                    help="append rejected requests to this file (S9)")

    sc = sub.add_parser("curate", help="document curation pipeline")
    sc.add_argument("--docs", required=True, help="documents parquet path")
    sc.add_argument("--out", default=None)
    sc.add_argument("--min-quality", type=float, default=0.5)
    sc.add_argument("--langs", default="en", help="comma-separated")
    sc.add_argument("--max-bucket", type=int, default=100_000,
                    help="LSH skew guard (oversized buckets skip pairing)")

    sdi = sub.add_parser("dedup-increment",
                         help="admit a crawl increment against the resident "
                              "corpus (resident never self-pairs)")
    sdi.add_argument("--new", required=True, help="new documents parquet")
    sdi.add_argument("--resident", required=True,
                     help="resident (already-curated) documents parquet")
    sdi.add_argument("--out", default=None,
                     help="optional parquet path for admitted doc_ids")
    sdi.add_argument("--threshold", type=float, default=0.2)
    sdi.add_argument("--max-bucket", type=int, default=100_000)
    sdi.add_argument("--band-index", default=None,
                     help="maintained resident band index (band-index "
                          "subcommand) — skips the resident text scan; its "
                          "sidecar params drive the new side's banding too")
    sdi.add_argument("--maintain", action="store_true",
                     help="append the admitted docs' band keys to "
                          "--band-index after admission (idempotent)")

    sbi = sub.add_parser("band-index",
                         help="build the maintained LSH band index of a "
                              "resident corpus (dedup-increment "
                              "--band-index input)")
    sbi.add_argument("--docs", required=True, help="corpus parquet")
    sbi.add_argument("--out", required=True, help="index path")
    sbi.add_argument("-k", type=int, default=8)
    sbi.add_argument("--bands", type=int, default=2)
    sbi.add_argument("-n", type=int, default=5)

    ss = sub.add_parser("sessions", help="stateful streaming sessionization")
    ss.add_argument("--events-dir", required=True)
    ss.add_argument("--out", required=True)
    ss.add_argument("--checkpoint", required=True)
    ss.add_argument("--gap", type=int, default=1800)
    ss.add_argument("--mode", default="append", choices=("append", "update"),
                    help="append = closed sessions only; update = retraction "
                         "stream (open/closed/retracted rows, upsert sink)")

    st = sub.add_parser("tiles", help="tile histogram over the prepared table")
    st.add_argument("--prepared", required=True)
    st.add_argument("--zoom", type=int, default=14)
    st.add_argument("--out", default=None, help="optional parquet output path")

    sh = sub.add_parser("heatmaps",
                        help="render per-tile point-density heatmap PNGs "
                             "(the live-map raster sink)")
    sh.add_argument("--prepared", required=True)
    sh.add_argument("--zoom", type=int, default=14)
    sh.add_argument("--out", required=True,
                    help="parquet output (z, tx, ty, metadata, png)")

    sm = sub.add_parser("stream", help="drain new raw files (availableNow)")
    sm.add_argument("--raw-dir", required=True)
    sm.add_argument("--prepared", required=True)
    sm.add_argument("--checkpoint", required=True)

    se = sub.add_parser("export", help="distributed GeoJSONL export of a POI query")
    se.add_argument("--prepared", required=True)
    se.add_argument("--payload", required=True, help="JSON request dict")
    se.add_argument("--out", required=True)

    sk = sub.add_parser("knn", help="k nearest POIs (lineage-seeded single probe)")
    sk.add_argument("--prepared", required=True)
    sk.add_argument("--lon", type=float, required=True)
    sk.add_argument("--lat", type=float, required=True)
    sk.add_argument("-k", type=int, default=10)

    si = sub.add_parser("ivf-build", help="materialize IVF-partitioned embeddings")
    si.add_argument("--emb", required=True, help="embeddings parquet path")
    si.add_argument("--out", required=True)
    si.add_argument("--centroids", type=int, default=256)
    si.add_argument("--sample", type=int, default=100_000,
                    help="training sample size (driver-side k-means)")

    sip = sub.add_parser("ivfpq-build",
                         help="materialize the IVF+PQ layout: embeddings + "
                              "codes partitioned by trained cell, both "
                              "codebooks as sidecars")
    sip.add_argument("--emb", required=True)
    sip.add_argument("--out", required=True)
    sip.add_argument("--centroids", type=int, default=256)
    sip.add_argument("--pq-m", type=int, default=8,
                     help="PQ subspace count (dim must divide)")
    sip.add_argument("--pq-ks", type=int, default=16,
                     help="centroids per PQ subspace")
    sip.add_argument("--sample", type=int, default=100_000,
                     help="driver-side training sample bound")

    sia = sub.add_parser("ivf-append",
                         help="append new vectors into an IVF layout "
                              "(persisted codebook, commit-locked, idempotent)")
    sia.add_argument("--emb", required=True, help="new vectors parquet path")
    sia.add_argument("--table", required=True, help="existing ivf-build output")
    sia.add_argument("--no-dedup", action="store_true",
                     help="skip the resident vec_id anti-join")

    sipa = sub.add_parser("ivfpq-append",
                          help="append new vectors into an IVF+PQ layout "
                               "(persisted sidecars encode cells AND codes, "
                               "commit-locked, idempotent)")
    sipa.add_argument("--emb", required=True, help="new vectors parquet path")
    sipa.add_argument("--table", required=True,
                      help="existing ivfpq-build output")
    sipa.add_argument("--no-dedup", action="store_true")

    shm = sub.add_parser("stream-heatmaps",
                         help="incremental live-map PNG renderer over a "
                              "file-arrival point stream")
    shm.add_argument("--points-dir", required=True,
                     help="directory parquet files with lon/lat arrive in")
    shm.add_argument("--out", required=True, help="heatmap store root")
    shm.add_argument("--checkpoint", required=True)
    shm.add_argument("--zoom", type=int, default=14)
    shm.add_argument("--continuous", action="store_true",
                     help="keep running (default drains availableNow)")
    shm.add_argument("--compact", action="store_true",
                     help="fold the pixel-partial store into one dir "
                          "after the drain (crash-safe manifest protocol)")

    sd = sub.add_parser("image-dedup", help="perceptual-hash image near-dup pairs")
    sd.add_argument("--images", required=True, help="poi_images parquet path")
    sd.add_argument("--out", default=None)
    sd.add_argument("--max-dist", type=int, default=3)
    sd.add_argument("--max-bucket", type=int, default=100_000)

    sb = sub.add_parser("batch-join",
                        help="N query geometries vs the prepared table, one job")
    sb.add_argument("--prepared", required=True)
    sb.add_argument("--geoms", required=True,
                    help="geometry table parquet (geom_id long, gspec string "
                         "— batchjoin.pack_geom JSON)")
    sb.add_argument("--out", required=True)
    sb.add_argument("--res", type=int, default=12, help="cover/join cell res")
    sb.add_argument("--counts", action="store_true",
                    help="write per-geometry counts instead of pairs")
    sb.add_argument("--nearest", action="store_true",
                    help="write each point's nearest geometry instead of pairs")
    sb.add_argument("--salt-threshold", type=int, default=0,
                    help="salt pcells whose lineage row count exceeds this "
                         "(0 = no salting)")

    sco = sub.add_parser("compact",
                         help="small-file compaction of pcell directories")
    sco.add_argument("--prepared", required=True)
    sco.add_argument("--min-files", type=int, default=2)

    sbk = sub.add_parser("batch-knn",
                         help="k nearest POIs for each of N probe locations, "
                              "one job (disk-cover join + fence re-probe)")
    sbk.add_argument("--prepared", required=True)
    sbk.add_argument("--queries", required=True,
                     help="probe table parquet (query_id long, qlon double, "
                          "qlat double — batchjoin.KNN_QUERY_SCHEMA)")
    sbk.add_argument("--out", required=True)
    sbk.add_argument("-k", type=int, default=10)
    sbk.add_argument("--res", type=int, default=14, help="join cell res")
    sbk.add_argument("--no-pcell-prune", action="store_true",
                     help="skip the probe-footprint partition pruning "
                          "(planet-spread probe sets)")
    sbk.add_argument("--salt-threshold", type=int, default=0,
                     help="salt pcells whose lineage row count exceeds this "
                          "(0 = no salting)")

    sba = sub.add_parser("ann-batch",
                         help="top-k nearest embeddings for each of N query "
                              "vectors, one job (LSH/IVF bucket join + brute "
                              "fill fence)")
    sba.add_argument("--emb", required=True, help="embeddings parquet path")
    sba.add_argument("--queries", required=True,
                     help="query table parquet (query_id long, "
                          "qvec array<float>)")
    sba.add_argument("--out", required=True)
    sba.add_argument("-k", type=int, default=10)
    sba.add_argument("--method", choices=("lsh", "ivf", "brute", "ivfpq"),
                     default="lsh")
    sba.add_argument("--table", default=None,
                     help="ivfpq: written ivfpq-build layout to probe "
                          "(codes-first ranking + exact re-rank)")
    sba.add_argument("--shortlist", type=int, default=4,
                     help="ivfpq: exact re-rank depth multiplier (k*this)")
    sba.add_argument("--target-bucket", type=int, default=1024,
                     help="LSH: expected bucket size the plane count is "
                          "sized for")
    sba.add_argument("--centroids", type=int, default=256,
                     help="IVF: codebook size (trained on a driver sample)")
    sba.add_argument("--nprobe", type=int, default=4)
    sba.add_argument("--mmr", type=float, default=None, metavar="LAMBDA",
                     help="diversity re-rank the pool with MMR at this "
                          "lambda (pool size becomes 4*k before the pick)")

    sf = sub.add_parser("frames", help="sample video/image frames (AVI real)")
    sf.add_argument("--images", required=True, help="payload parquet path")
    sf.add_argument("--out", required=True)
    sf.add_argument("--n-frames", type=int, default=4)
    sf.add_argument("--on-error", default="skip", choices=("skip", "fail"))

    args = p.parse_args(argv)

    from openpoiservice_spark.session import get_spark

    spark = get_spark(app=f"opss-{args.cmd}")

    if args.cmd == "prepare":
        from openpoiservice_spark import prepare

        stats = prepare.prepare(spark, args.raw, args.prepared,
                                resume=not args.no_resume,
                                raw_format=args.format)
        print(json.dumps(stats))
    elif args.cmd == "pois":
        from openpoiservice_spark.api import PoiEngine

        eng = PoiEngine(spark, args.prepared, invalid_log=args.invalid_log)
        out = eng.request(json.loads(args.payload))
        print(json.dumps(out))
    elif args.cmd == "curate":
        from openpoiservice_spark.operators import text as TX

        docs = spark.read.parquet(args.docs)
        kept = TX.curate(docs, args.min_quality,
                         tuple(args.langs.split(",")), max_bucket=args.max_bucket)
        if args.out:
            kept.write.mode("overwrite").parquet(args.out)
        print(json.dumps({"kept": kept.count(), "total": docs.count()}))
    elif args.cmd == "dedup-increment":
        from openpoiservice_spark.operators import text as TX

        new = spark.read.parquet(args.new)
        resident = spark.read.parquet(args.resident)
        kwargs = {}
        if args.band_index:
            # both sides MUST band with the index's persisted params or
            # the new side's bucket keys would never collide with resident
            params = TX.read_band_params(spark, args.band_index) or {}
            kwargs = {kw: params[kw] for kw in
                      ("k", "bands", "n", "hash_fn") if kw in params}
            kwargs["resident_banded"] = \
                TX.read_band_index(spark, args.band_index)
        admitted = TX.dedup_increment(new, resident, args.threshold,
                                      max_bucket=args.max_bucket,
                                      **kwargs).persist()
        out = {"admitted": admitted.count(), "new_total": new.count()}
        if args.out:
            admitted.write.mode("overwrite").parquet(args.out)
        if args.band_index and args.maintain:
            out["bands_appended"] = TX.append_band_index(
                spark, args.band_index, new.join(admitted, "doc_id"))
        admitted.unpersist()
        print(json.dumps(out))
    elif args.cmd == "band-index":
        from openpoiservice_spark.operators import text as TX

        docs = spark.read.parquet(args.docs)
        TX.write_band_index(docs, args.out, k=args.k, bands=args.bands,
                            n=args.n)
        print(json.dumps({"docs": docs.count(), "index": args.out}))
    elif args.cmd == "sessions":
        from pyspark.sql import types as T

        from openpoiservice_spark import streaming

        schema = T.StructType([
            T.StructField("user_id", T.LongType()),
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ])
        from pyspark.sql import functions as F

        src = spark.readStream.schema(schema).parquet(args.events_dir)
        if args.mode == "update":
            # the file sink is append-only, so the update stream lands as a
            # CHANGELOG (one row per open/closed/retracted emission, stamped
            # with its batch id) — a downstream MERGE keyed by
            # (user_id, session_start) materializes the current sessions
            sessions = streaming.stream_sessionize_update(src, gap_s=args.gap)
            out_path = args.out

            def _sink(bdf, bid):
                (bdf.withColumn("batch_id", F.lit(bid))
                 .write.mode("append").parquet(out_path))

            q = (sessions.writeStream.foreachBatch(_sink).outputMode("update")
                 .option("checkpointLocation", args.checkpoint)
                 .trigger(availableNow=True).start())
        else:
            sessions = streaming.stream_sessionize(src, gap_s=args.gap)
            q = (sessions.writeStream.format("parquet")
                 .option("path", args.out)
                 .option("checkpointLocation", args.checkpoint)
                 .trigger(availableNow=True).start())
        q.awaitTermination()
        print(json.dumps({"status": "drained", "out": args.out}))
    elif args.cmd == "tiles":
        from openpoiservice_spark import prepare, tiles

        df = prepare.read_prepared(spark, args.prepared)
        hist = tiles.tile_histogram(
            df.select("image_id", "lon", "lat", "w", "h"), args.zoom
        )
        if args.out:
            hist.write.mode("overwrite").parquet(args.out)
            print(json.dumps({"tiles": hist.count(), "out": args.out}))
        else:
            print(json.dumps({"tiles": hist.count()}))
    elif args.cmd == "heatmaps":
        from openpoiservice_spark import prepare, tiles

        df = prepare.read_prepared(spark, args.prepared)
        hm = tiles.tile_heatmaps(df.select("lon", "lat"), z=args.zoom)
        hm.write.mode("overwrite").partitionBy("z").parquet(args.out)
        print(json.dumps({"tiles": spark.read.parquet(args.out).count(),
                          "out": args.out}))
    elif args.cmd == "stream":
        from openpoiservice_spark import streaming

        streaming.stream_prepare(spark, args.raw_dir, args.prepared, args.checkpoint)
        print(json.dumps({"status": "drained"}))
    elif args.cmd == "export":
        from openpoiservice_spark.api import PoiEngine

        eng = PoiEngine(spark, args.prepared)
        n = eng.export_geojsonl(json.loads(args.payload), args.out)
        print(json.dumps({"features": n, "out": args.out}))
    elif args.cmd == "knn":
        from openpoiservice_spark.api import PoiEngine

        eng = PoiEngine(spark, args.prepared)
        ps: dict = {}
        rows = eng.knn_df(args.lon, args.lat, args.k, probe_stats=ps).collect()
        print(json.dumps({
            "probes": ps.get("probes"),
            "results": [{"image_id": r.image_id, "lon": r.lon, "lat": r.lat,
                         "distance": r.distance} for r in rows],
        }))
    elif args.cmd == "ivf-build":
        import numpy as np

        from openpoiservice_spark.operators import ann as ANN

        emb = spark.read.parquet(args.emb)
        n = emb.count()
        frac = min(1.0, args.sample / max(n, 1))
        sample = np.array(
            emb.sample(frac, seed=7).limit(args.sample)
            .select("embedding").toPandas()["embedding"].tolist()
        )
        cb = ANN.ivf_train(sample, n_centroids=args.centroids)
        ANN.write_ivf_table(emb, args.out, cb)
        print(json.dumps({"rows": n, "centroids": args.centroids, "out": args.out}))
    elif args.cmd == "ivfpq-build":
        import numpy as np

        from openpoiservice_spark.operators import ann as ANN

        emb = spark.read.parquet(args.emb)
        n = emb.count()
        frac = min(1.0, args.sample / max(n, 1))
        sample = np.array(
            emb.sample(frac, seed=7).limit(args.sample)
            .select("embedding").toPandas()["embedding"].tolist()
        )
        cent = ANN.ivf_train(sample, n_centroids=args.centroids)
        cb = ANN.pq_train(sample, m=args.pq_m, ks=args.pq_ks)
        ANN.write_ivfpq_table(emb, args.out, cent, cb)
        print(json.dumps({"rows": n, "centroids": args.centroids,
                          "pq_m": args.pq_m, "pq_ks": args.pq_ks,
                          "out": args.out}))
    elif args.cmd == "ivf-append":
        from openpoiservice_spark.operators import ann as ANN

        appended = ANN.append_ivf_table(
            spark, args.table, spark.read.parquet(args.emb),
            dedup=not args.no_dedup)
        print(json.dumps({"appended": appended, "table": args.table}))
    elif args.cmd == "ivfpq-append":
        from openpoiservice_spark.operators import ann as ANN

        appended = ANN.append_ivfpq_table(
            spark, args.table, spark.read.parquet(args.emb),
            dedup=not args.no_dedup)
        print(json.dumps({"appended": appended, "table": args.table}))
    elif args.cmd == "stream-heatmaps":
        from openpoiservice_spark import streaming as STR

        schema = "lon double, lat double"
        src = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", "4")
               .parquet(args.points_dir).select("lon", "lat"))
        w = (STR.stream_heatmap_sink(src, args.out, z=args.zoom)
             .option("checkpointLocation", args.checkpoint))
        if args.continuous:
            w.start().awaitTermination()
        else:
            q = w.trigger(availableNow=True).start()
            q.awaitTermination()
            res = {"tiles": spark.read.parquet(f"{args.out}/tiles").count(),
                   "out": args.out}
            if args.compact:
                res["compact"] = STR.compact_heatmap_pixels(spark, args.out)
            print(json.dumps(res))
    elif args.cmd == "ann-batch":
        import numpy as np

        from openpoiservice_spark.operators import ann as ANN

        emb = spark.read.parquet(args.emb)
        qdf = spark.read.parquet(args.queries)
        k = args.k if args.mmr is None else 4 * args.k
        if args.method == "ivfpq":
            if not args.table:
                raise SystemExit("--method ivfpq requires --table "
                                 "(an ivfpq-build output)")
            out = ANN.batch_topk_ivfpq_table(
                spark, args.table, qdf, k,
                nprobe=args.nprobe, shortlist=args.shortlist)
        elif args.method == "brute":
            out = ANN.batch_topk_brute(emb, qdf, k)
        elif args.method == "ivf":
            n = emb.count()
            frac = min(1.0, 100_000 / max(n, 1))
            sample = np.array(
                emb.sample(frac, seed=7).limit(100_000)
                .select("embedding").toPandas()["embedding"].tolist()
            )
            cb = ANN.ivf_train(sample, n_centroids=args.centroids)
            out = ANN.batch_topk_ivf(emb, qdf, k, cb,
                                     nprobe=args.nprobe)
        else:
            planes = ANN.auto_hyperplanes(
                emb, target_bucket=args.target_bucket)
            out = ANN.batch_topk(emb, qdf, k, planes)
        if args.mmr is not None:
            out = ANN.mmr_rerank(emb, out, args.k, lam=args.mmr)
        out.write.mode("overwrite").parquet(args.out)
        n_out = spark.read.parquet(args.out).count()
        print(json.dumps({"method": args.method, "k": args.k,
                          "mmr": args.mmr, "rows": n_out, "out": args.out}))
    elif args.cmd == "image-dedup":
        from pyspark.sql import functions as F

        from openpoiservice_spark.operators import images as IM

        imgs = spark.read.parquet(args.images)
        hashed = IM.dct_phash(imgs)
        pairs = IM.hamming_pairs(hashed, col="dct_phash", key="image_id",
                                 max_dist=args.max_dist, max_bucket=args.max_bucket)
        if args.out:
            pairs.write.mode("overwrite").parquet(args.out)
        print(json.dumps({"pairs": pairs.count()}))
    elif args.cmd == "batch-join":
        from pyspark.sql import functions as F

        from openpoiservice_spark import batchjoin, config, prepare

        pts = prepare.read_prepared(spark, args.prepared).select(
            F.col("osm_id").alias("poi_id"), "lon", "lat", "pcell")
        gdf = spark.read.parquet(args.geoms)
        salt = None
        if args.salt_threshold > 0:
            salt = batchjoin.auto_salt_cells(
                prepare.load_pcell_stats(spark, args.prepared),
                args.salt_threshold)
        if args.counts:
            fn = batchjoin.batch_join_counts
        elif args.nearest:
            fn = batchjoin.batch_nearest
        else:
            fn = batchjoin.batch_spatial_join
        out = fn(pts, gdf, res=args.res, keep_cols=("poi_id",),
                 salt_cells=salt, pcell_col="pcell")
        out.write.mode("overwrite").parquet(args.out)
        print(json.dumps({
            "rows": spark.read.parquet(args.out).count(),
            "geoms": gdf.count(), "salted_cells": len(salt or {}),
        }))
    elif args.cmd == "compact":
        from openpoiservice_spark import prepare

        print(json.dumps(prepare.compact(spark, args.prepared,
                                         min_files=args.min_files)))
    elif args.cmd == "batch-knn":
        from pyspark.sql import functions as F

        from openpoiservice_spark import batchjoin, prepare

        pts = prepare.read_prepared(spark, args.prepared).select(
            F.col("osm_id").alias("poi_id"), "lon", "lat", "pcell")
        qdf = spark.read.parquet(args.queries)
        stats = {}
        pstats = prepare.load_pcell_stats(spark, args.prepared)
        salt = (batchjoin.auto_salt_cells(pstats, args.salt_threshold)
                if args.salt_threshold > 0 else None)
        out = batchjoin.batch_knn(
            pts, qdf, k=args.k, res=args.res, keep_cols=("poi_id",),
            pcell_rows=pstats,
            pcell_col=None if args.no_pcell_prune else "pcell",
            salt_cells=salt, probe_stats=stats)
        out.write.mode("overwrite").parquet(args.out)
        print(json.dumps({
            "rows": spark.read.parquet(args.out).count(),
            "queries": qdf.count(), "rounds": stats.get("rounds"),
        }))
    elif args.cmd == "frames":
        from openpoiservice_spark.operators import images as IM

        imgs = spark.read.parquet(args.images)
        frames = IM.sample_frames(imgs, n_frames=args.n_frames,
                                  on_error=args.on_error)
        frames.write.mode("overwrite").parquet(args.out)
        print(json.dumps({"frames": spark.read.parquet(args.out).count()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
