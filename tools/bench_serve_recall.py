"""Recall/latency curve for the external-query serving path
(`llm.similarity.ivf_pq_search`) across its two production dials —
``nprobe`` (posting lists visited) and ``shortlist`` (ADC survivors
exactly re-ranked) — against brute-force cosine ground truth at
$SPARK_GRAFT_SF_DIR. The numbers tell a caller what recall each dial
setting buys and what it costs; docs/SCALE.md records the table.
Self-matches count as hits in BOTH paths (external serving keeps
coincident corpus twins — a real exact-dup signal)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F  # noqa: E402

from myodish_peak_analysis_spark.llm import similarity as S  # noqa: E402
from myodish_peak_analysis_spark.schema import read_table  # noqa: E402
from myodish_peak_analysis_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = 10


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--factor",
        type=int,
        default=1,
        help="replicate the corpus K× (signed-permutation rotations, "
        "the emb-decade scheme) before the sweep — recall dials must "
        "be re-derived at the scale they serve",
    )
    ap.add_argument("--nprobes", type=str, default="1,2,4,8,16,24")
    ap.add_argument("--shortlists", type=str, default="50,200,600")
    ap.add_argument(
        "--m",
        type=str,
        default="4",
        help="PQ code width for the fit — an int or 'auto' (the "
        "round-9 budget floor); the r8 recovery point used 16",
    )
    ap.add_argument(
        "--sq8",
        action="store_true",
        help="also measure the IVF×SQ8 serving route (prefit IVF "
        "half, int8-reconstructed in-list scoring, no shortlist "
        "dial) at each nprobe",
    )
    args = ap.parse_args()

    def dial(x: str):
        return x if x == "auto" else int(x)

    nprobes = [dial(x) for x in args.nprobes.split(",")]
    shortlists = [dial(x) for x in args.shortlists.split(",")]
    fit_m = dial(args.m)

    spark = get_spark("bench-serve-recall")
    spark.sparkContext.setLogLevel("ERROR")
    emb = read_table(spark, SF_DIR, "embeddings")
    if args.factor > 1:
        from tools.bench_scaling import _replicate_emb

        # repartition exactly as bench_scaling's call sites do: the
        # sf0.1 parquet is ONE row group, so the exploded K× corpus
        # inherits a single partition and every downstream stage —
        # including the brute-force truth join — runs on one core
        # (observed: a 28-minute single-task stage at factor=1000).
        emb = _replicate_emb(emb, args.factor).repartition(
            spark.sparkContext.defaultParallelism
        )
    emb = emb.cache()
    emb.count()
    qs = emb.filter(
        F.col("vec_id") % (S.ANN_QUERY_MOD * args.factor) == 0
    ).select(
        (F.col("vec_id") + 10_000_000_000).alias("query_id"), "embedding"
    ).cache()

    qn = S._with_norm(
        qs.select(F.col("query_id").alias("vec_id"), "embedding")
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("_norm").alias("q_norm"),
    )
    cn = S._with_norm(emb).select(
        "vec_id", F.col("embedding").alias("c_emb"), F.col("_norm").alias("c_norm")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    truth = (
        qn.crossJoin(cn)
        .select(
            "query_id",
            "vec_id",
            F.round(
                S._dot("q_emb", "c_emb") / (F.col("q_norm") * F.col("c_norm")), 6
            ).alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= K)
        .select("query_id", "vec_id")
        .cache()
    )
    n_truth = truth.count()

    t0 = time.time()
    idx = S.fit_ivf_pq_index(emb, n_clusters="auto", m=fit_m)
    print(
        json.dumps(
            {
                "metric": "ivf_pq_fit",
                "m": idx.m,
                "n_lists": idx.cents.count(),
                "n_vectors": emb.count(),
                "sec": round(time.time() - t0, 3),
                "factor": args.factor,
            }
        ),
        flush=True,
    )

    def probe_ceiling(nprobe: int) -> float:
        """Fraction of true top-K pairs inside the probed posting
        lists — the recall CEILING the IVF probe imposes before PQ/
        shortlist see anything. recall == ceiling means the ADC stage
        is lossless at this dial; recall < ceiling blames the
        shortlist."""
        qprobe = (
            qn.crossJoin(F.broadcast(idx.cents))
            .withColumn(
                "_cos",
                F.round(
                    S._dot("q_emb", "c_emb")
                    / (F.col("q_norm") * F.col("c_norm")),
                    9,
                ),
            )
            .withColumn(
                "_rk",
                F.row_number().over(
                    Window.partitionBy("query_id").orderBy(
                        F.col("_cos").desc(), F.col("centroid_id")
                    )
                ),
            )
            .filter(F.col("_rk") <= nprobe)
            .select("query_id", "centroid_id")
        )
        cand = qprobe.join(
            idx.members.select("centroid_id", "vec_id"), "centroid_id"
        ).select("query_id", "vec_id")
        return cand.join(truth, ["query_id", "vec_id"]).count() / n_truth

    n_lists = idx.cents.count()

    def sq8_serve(np_res: int):
        """External-query IVF×SQ8 serving plan (the ivf_sq8_topk
        stage shape with the tool's external query frame: prefit IVF
        half, probe, posting-list restriction, int8-reconstructed
        in-list cosine, no self-exclusion — mirroring ivf_pq_search's
        serving contract)."""
        cand8 = (
            S._sq8_coded(emb)
            .select(
                "vec_id",
                F.expr(
                    "zip_with(codes, _scales, "
                    "(c, s) -> CAST(c AS DOUBLE) * s / 127D)"
                ).alias("xhat"),
            )
            .withColumn("_cnorm", F.sqrt(S._dot("xhat", "xhat")))
        )
        qprobe = (
            qn.crossJoin(F.broadcast(idx.cents))
            .withColumn(
                "_cos",
                F.round(
                    S._dot("q_emb", "c_emb")
                    / (F.col("q_norm") * F.col("c_norm")),
                    9,
                ),
            )
            .withColumn(
                "_rk",
                F.row_number().over(
                    Window.partitionBy("query_id").orderBy(
                        F.col("_cos").desc(), F.col("centroid_id")
                    )
                ),
            )
            .filter(F.col("_rk") <= np_res)
            .select("query_id", "q_emb", "q_norm", "centroid_id")
        )
        scored = qprobe.join(
            idx.members.select("centroid_id", "vec_id"), "centroid_id"
        ).join(cand8, "vec_id")
        cos = F.round(
            S._dot("q_emb", "xhat") / (F.col("q_norm") * F.col("_cnorm")), 6
        )
        return (
            scored.select("query_id", "vec_id", cos.alias("cosine"))
            .withColumn(
                "rank",
                F.row_number().over(
                    Window.partitionBy("query_id").orderBy(
                        F.col("cosine").desc(), F.col("vec_id")
                    )
                ),
            )
            .filter(F.col("rank") <= K)
        )

    for nprobe in nprobes:
        np_res = S._resolve_nprobe(nprobe, idx.cents)
        ceil = probe_ceiling(np_res)
        for shortlist in shortlists:
            sl_res = S._resolve_shortlist(shortlist, np_res, K)
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                S.ivf_pq_search(
                    qs, idx, k=K, nprobe=np_res, shortlist=sl_res
                ).write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            hits = (
                S.ivf_pq_search(qs, idx, k=K, nprobe=np_res, shortlist=sl_res)
                .select("query_id", "vec_id")
                .join(truth, ["query_id", "vec_id"])
                .count()
            )
            print(
                json.dumps(
                    {
                        "metric": f"serve_recall@{K}",
                        "nprobe": nprobe,
                        "nprobe_resolved": np_res,
                        "scan_fraction": round(np_res / n_lists, 4),
                        "shortlist": shortlist,
                        "shortlist_resolved": sl_res,
                        "m": idx.m,
                        "probe_ceiling": round(ceil, 3),
                        "recall": round(hits / n_truth, 3),
                        "sec": round(best, 3),
                        "factor": args.factor,
                        "sf_dir": SF_DIR,
                    }
                ),
                flush=True,
            )
        if args.sq8:
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                sq8_serve(np_res).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.time() - t0)
            hits = (
                sq8_serve(np_res)
                .select("query_id", "vec_id")
                .join(truth, ["query_id", "vec_id"])
                .count()
            )
            print(
                json.dumps(
                    {
                        "metric": f"sq8_serve_recall@{K}",
                        "nprobe": nprobe,
                        "nprobe_resolved": np_res,
                        "scan_fraction": round(np_res / n_lists, 4),
                        "probe_ceiling": round(ceil, 3),
                        "recall": round(hits / n_truth, 3),
                        "sec": round(best, 3),
                        "factor": args.factor,
                        "sf_dir": SF_DIR,
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
