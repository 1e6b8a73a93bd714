"""Recall-vs-appended-fraction curve for `ivf_pq_append` (VERDICT r10
ask #3): how far does serving recall decay as mass is appended to a
FROZEN-centroid index, versus refitting on the grown corpus — and what
does `index_health` read at each point?

Protocol per appended fraction f in --fracs:
  1. fit an IvfPqIndex on the base corpus C;
  2. append a batch A with |A| = f*|C| — either SAME-distribution
     (held-out rows of the harness embeddings) or DRIFTED (a constant
     mean-shift of held-out rows: every coordinate +1.0, the
     new-domain ingest case — the shifted mass is cosine-coherent, so
     a frozen quantizer funnels it into few posting lists and the
     frozen PQ codebooks, fit on centered data, can't encode it);
  3. serve one fixed query batch drawn HALF from C and HALF from A
     (drifted neighbors must actually be queried, or the decay is
     invisible to base-distribution queries) against (a) the appended
     index, (b) a COLD fit on the grown source frame C ∪ A, and
     (c — round 12, VERDICT r11 ask #6) the REFIT PATH
     `refit_ivf_pq_index(appended)` that reads the corpus back off the
     appended index's posting lists;
  4. report recall@10 for all three against brute-force cosine truth
     over C ∪ A, plus index_health(appended index). (The cold-fit
     column was named `sec_refit_serve` before round 12 —
     `sec_coldfit_serve` since.)

Output: one JSON line per (mode, frac) cell; docs/SCALE.md records the
table and `needs_refit`'s default thresholds are set from the knee.
"""

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


def _truth_topk(queries, corpus):
    """Brute-force cosine top-K per query over the grown corpus —
    self-matches included (external serving keeps coincident twins)."""
    qn = S._with_norm(queries).select(
        "query_id",
        F.col("embedding").alias("q_emb"),
        F.col("_norm").alias("q_norm"),
    )
    cn = S._with_norm(corpus).select(
        "vec_id",
        F.col("embedding").alias("c_emb"),
        F.col("_norm").alias("c_norm"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    return (
        qn.crossJoin(cn)
        .select(
            "query_id",
            "vec_id",
            F.round(
                S._dot("q_emb", "c_emb") / (F.col("q_norm") * F.col("c_norm")),
                6,
            ).alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= K)
        .select("query_id", "vec_id")
    )


def _recall(result, truth_df, n_truth):
    hits = (
        result.select("query_id", "vec_id")
        .join(truth_df, ["query_id", "vec_id"])
        .count()
    )
    return hits / n_truth


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--fracs", type=str, default="0.1,0.5,1.0")
    ap.add_argument(
        "--modes", type=str, default="same,drift",
        help="same = held-out harness rows; drift = signed-permutation "
        "rotated copies (distribution shift off the fitted centroids)",
    )
    ap.add_argument("--nprobe", type=int, default=2)
    ap.add_argument("--shortlist", type=int, default=20)
    ap.add_argument(
        "--factor", type=int, default=1,
        help="replicate the corpus K× (signed-permutation rotations, "
        "the emb-decade scheme) before the split — validates the "
        "tripwire thresholds at the scale they serve",
    )
    args = ap.parse_args()
    fracs = [float(x) for x in args.fracs.split(",")]
    modes = args.modes.split(",")

    spark = get_spark("bench-append-refit")
    spark.sparkContext.setLogLevel("ERROR")
    emb = read_table(spark, SF_DIR, "embeddings")
    if args.factor > 1:
        from tools.bench_scaling import _replicate_emb

        emb = _replicate_emb(emb, args.factor).repartition(
            spark.sparkContext.defaultParallelism
        )
    emb = emb.cache()
    n_all = emb.count()

    # base corpus C: half the harness rows; append pools from the held-
    # out other half — "same" keeps them verbatim, "drift" mean-shifts
    # every coordinate +1.0 (ids shifted by 1e9 in both so they never
    # collide with C).
    corpus = emb.filter(F.col("vec_id") % 2 == 0).select(
        "vec_id", "embedding"
    ).cache()
    held = emb.filter(F.col("vec_id") % 2 == 1).select(
        (F.col("vec_id") + 1_000_000_000).alias("vec_id"), "embedding"
    )
    n_corpus = corpus.count()
    pool_same = held
    pool_drift = held.select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> CAST(x + 1.0 AS FLOAT))"
        ).alias("embedding"),
    )

    rows = []
    for mode in modes:
        pool = pool_same if mode == "same" else pool_drift
        pool = pool.cache()
        n_pool = pool.count()
        idx = S.fit_ivf_pq_index(corpus, n_clusters="auto")
        base_health = S.index_health(idx)
        for frac in fracs:
            take = int(round(frac * n_corpus))
            if take > n_pool:
                print(
                    f"# skip {mode} f={frac}: pool has {n_pool} < {take}",
                    file=sys.stderr,
                )
                continue
            # deterministic prefix of the pool by vec_id order
            w = Window.orderBy("vec_id")
            batch = (
                pool.withColumn("_r", F.row_number().over(w))
                .filter(F.col("_r") <= take)
                .drop("_r")
            ).cache()
            grown = corpus.unionByName(batch).cache()
            # fixed-size query batch, HALF base / HALF appended mass
            # (a drifted region no query lands in cannot lose recall)
            qn = max(2, grown.count() // 40)
            queries = (
                corpus.filter(F.col("vec_id") % (2 * qn) == 0)
                .unionByName(batch.filter(F.col("vec_id") % qn == 1))
                .select(
                    (F.col("vec_id") + 10_000_000).alias("query_id"),
                    "embedding",
                )
                .cache()
            )
            queries.count()
            truth = _truth_topk(queries, grown).cache()
            n_truth = truth.count()

            t0 = time.time()
            idx_app = S.ivf_pq_append(idx, batch)
            r_app = _recall(
                S.ivf_pq_search(
                    queries, idx_app, k=K,
                    nprobe=args.nprobe, shortlist=args.shortlist,
                ),
                truth, n_truth,
            )
            t_app = time.time() - t0
            health = S.index_health(idx_app)
            verdict = S.needs_refit(idx_app, health=health)

            t0 = time.time()
            idx_ref = S.fit_ivf_pq_index(grown, n_clusters="auto")
            r_ref = _recall(
                S.ivf_pq_search(
                    queries, idx_ref, k=K,
                    nprobe=args.nprobe, shortlist=args.shortlist,
                ),
                truth, n_truth,
            )
            t_ref = time.time() - t0

            # VERDICT r11 ask #6: the REFIT PATH (refit_ivf_pq_index —
            # corpus read back off the appended index's posting lists,
            # nlist re-sized ~ sqrt(N)) timed against the cold fit
            # above (fit_ivf_pq_index on the grown source frame), both
            # serving the same query batch — does reading off posting
            # lists buy wall time at scale, and does it cost recall?
            t0 = time.time()
            idx_rp = S.refit_ivf_pq_index(idx_app, release_old=False)
            r_rp = _recall(
                S.ivf_pq_search(
                    queries, idx_rp, k=K,
                    nprobe=args.nprobe, shortlist=args.shortlist,
                ),
                truth, n_truth,
            )
            t_rp = time.time() - t0

            row = {
                "mode": mode,
                "appended_fraction": round(health["appended_fraction"], 3),
                "n_corpus": n_corpus,
                "n_appended": take,
                "recall_appended": round(r_app, 3),
                "recall_refit": round(r_ref, 3),
                "recall_refit_path": round(r_rp, 3),
                "recall_gap": round(r_ref - r_app, 3),
                "imbalance_fit": round(base_health["imbalance"], 2),
                "imbalance_appended": round(health["imbalance"], 2),
                "empty_lists": health["empty_lists"],
                "needs_refit": verdict["refit"],
                "sec_append_serve": round(t_app, 1),
                "sec_coldfit_serve": round(t_ref, 1),
                "sec_refitpath_serve": round(t_rp, 1),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
            idx_app.unpersist()  # releases the per-batch append caches
            idx_ref.unpersist()
            idx_rp.unpersist()
            truth.unpersist()
            queries.unpersist()
            grown.unpersist()
            batch.unpersist()
        idx.unpersist()
        pool.unpersist()
    print(json.dumps({"cells": rows}), flush=True)


if __name__ == "__main__":
    main()
