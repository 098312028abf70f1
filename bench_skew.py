"""Skew-stress evidence for the KG pipeline (north-rule scaling story).

The 1M-page run (BENCH/BASELINE.md round 4) proves linear scaling on a
UNIFORM corpus; this script measures the salting/compute-partitioning
paths on an ADVERSARIAL one:

- one hot domain carries ~30% of all pages, every one of them mentioning
  the same entity pair → one scorching (subj, pred, obj) key in the triple
  aggregation;
- doc lengths are heavy-tailed: ~1% of pages are inflated ×50-100 and a
  few % ×8-20 (text repeated), so byte- or row-balanced task splits carry
  up to two orders of magnitude of compute imbalance.

For each stage it records wall seconds and the max/median task
executorRunTime (from Spark's own task metrics via the UI REST API),
comparing the naive plan against the mitigated one:

- extraction  naive: scan-order partitions (parquet byte splits)
              mitigated: ``by_compute`` round-robin repartition
              (4 row-balanced tasks per core — mitie_spark/session.py:88)
- triple agg  naive: direct groupBy(subj, pred, obj).count()
              mitigated: two-phase salted aggregate
              (operators/agg.salted_count)

PASS criterion (VERDICT r4 #4): mitigated p-max/p50 task-time ratio
bounded (< ~3×) through the extraction and triples stages. Appends a
section to BENCH/BASELINE.md.

Usage: python bench_skew.py [--pages 20000] [--cores 8] [--seed 7]
"""

from __future__ import annotations

import argparse
import json
import os
import time
import urllib.request

REPO = os.path.dirname(os.path.abspath(__file__))
UI_PORT = 4057


def build_skewed_corpus(out_dir: str, n_pages: int, seed: int) -> str:
    """Deterministic adversarial corpus derived from the uniform generator:
    hot domain + hot entity pair on ~30% of pages, heavy-tailed lengths."""
    import numpy as np
    import pandas as pd

    from mitie_spark.corpus import make_page

    path = os.path.join(out_dir, "pages.parquet")
    if os.path.exists(path):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    pages = []
    hot_sentence = (
        "Walter Hartwell consulted for Gray Matter Technologies in Albuquerque ."
    )
    for i in range(n_pages):
        page, _, _ = make_page(seed, i)
        r = rng.random()
        if r < 0.30:
            # hot domain, hot entity pair: ~30% of the corpus hits ONE
            # (subj, pred, obj) key and ONE domain
            page["url"] = f"https://hot.example.com/page/{i}"
            page["text"] = hot_sentence + " " + page["text"]
        # heavy-tailed length: 1% x50-100, 4% x8-20
        q = rng.random()
        if q < 0.01:
            page["text"] = " ".join([page["text"]] * int(rng.integers(50, 101)))
        elif q < 0.05:
            page["text"] = " ".join([page["text"]] * int(rng.integers(8, 21)))
        pages.append(page)
    pdf = pd.DataFrame(pages)
    pdf["warc_ts"] = pdf["warc_ts"].astype("datetime64[us]")
    pdf.to_parquet(path, index=False, row_group_size=500)
    return out_dir


def _rest(path: str):
    with urllib.request.urlopen(f"http://localhost:{UI_PORT}/api/v1{path}", timeout=30) as r:
        return json.loads(r.read())


class StageMeter:
    """Wall + max/p50 task executorRunTime of the stages an action ran."""

    def __init__(self, spark):
        self.spark = spark
        self.app_id = spark.sparkContext.applicationId

    def _done_stage_ids(self):
        return {
            (s["stageId"], s["attemptId"])
            for s in _rest(f"/applications/{self.app_id}/stages?status=complete")
        }

    def measure(self, label: str, action) -> dict:
        before = self._done_stage_ids()
        t0 = time.perf_counter()
        action()
        wall = time.perf_counter() - t0
        time.sleep(0.5)  # let the UI store catch up
        stages = []
        for sid, att in sorted(self._done_stage_ids() - before):
            summ = _rest(
                f"/applications/{self.app_id}/stages/{sid}/{att}/taskSummary"
                "?quantiles=0.5,1.0"
            )
            rt = summ["executorRunTime"]
            s = _rest(f"/applications/{self.app_id}/stages/{sid}/{att}")
            stages.append(
                {
                    "stage": sid,
                    "tasks": s[0]["numCompleteTasks"] if isinstance(s, list) else s["numCompleteTasks"],
                    "p50_ms": rt[0],
                    "max_ms": rt[1],
                }
            )
        # the stage that did the work = the one with the largest max task
        heavy = max(stages, key=lambda s: s["max_ms"]) if stages else None
        out = {
            "label": label,
            "wall_sec": round(wall, 2),
            "heavy_stage": heavy,
            "ratio": round(heavy["max_ms"] / max(heavy["p50_ms"], 1.0), 2)
            if heavy
            else None,
            "stages": stages,
        }
        print(json.dumps(out))
        return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=20000)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    corpus = build_skewed_corpus(
        os.path.join(REPO, "data", f"kg_skew{args.pages}"), args.pages, args.seed
    )

    from pyspark.sql import functions as F

    from mitie_spark.models.train import ARTIFACT_DIR
    from mitie_spark.operators.agg import salted_count
    from mitie_spark.operators.extraction import extract_kg, triples_table
    from mitie_spark.session import get_spark

    spark = get_spark(
        "bench_skew",
        master=f"local[{args.cores}]",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": str(UI_PORT)},
    )
    spark.sparkContext.setLogLevel("ERROR")
    meter = StageMeter(spark)
    pages = spark.read.parquet(os.path.join(corpus, "pages.parquet"))
    ner = os.path.join(ARTIFACT_DIR, "ner_model.npz")
    rel = os.path.join(ARTIFACT_DIR, "relation_model.npz")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # warm the python workers once so spawn cost doesn't pollute either arm
    noop(extract_kg(pages.limit(512), ner, rel, lang_filter=None, parallelism=args.cores))

    results = {}
    # --- extraction: naive scan-order tasks vs compute-sized tasks ---
    results["extract_naive"] = meter.measure(
        "extract_naive (parquet byte splits)",
        lambda: noop(extract_kg(pages, ner, rel, lang_filter=None)),
    )
    results["extract_bycompute"] = meter.measure(
        "extract_bycompute (round-robin 4 tasks/core)",
        lambda: noop(
            extract_kg(
                pages, ner, rel, lang_filter=None, parallelism=4 * args.cores
            )
        ),
    )

    # --- triple aggregation: hot key vs salted two-phase ---
    kg = extract_kg(
        pages, ner, rel, lang_filter=None, parallelism=4 * args.cores
    ).persist()
    trips = triples_table(kg).select("subj", "pred", "obj").persist()
    trips.count()  # materialize extraction once, outside both timed arms
    results["agg_naive"] = meter.measure(
        "agg_naive (direct groupBy)",
        lambda: noop(trips.groupBy("subj", "pred", "obj").count()),
    )
    results["agg_salted"] = meter.measure(
        "agg_salted (two-phase salted_count)",
        lambda: noop(salted_count(trips, ["subj", "pred", "obj"])),
    )

    ok = (
        results["extract_bycompute"]["ratio"] is not None
        and results["extract_bycompute"]["ratio"] < 3.0
        and results["agg_salted"]["ratio"] is not None
        and results["agg_salted"]["ratio"] < 3.0
    )
    summary = {
        "metric": "kg_pipeline_skew_stress",
        "pages": args.pages,
        "cores": args.cores,
        "hot_domain_share": 0.30,
        "pass": ok,
        "results": {
            k: {kk: v[kk] for kk in ("wall_sec", "ratio", "heavy_stage")}
            for k, v in results.items()
        },
    }
    print(json.dumps(summary))

    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(path, "a") as f:
        f.write(f"""
## BENCH — skew-stress run (bench_skew.py, appended)

Adversarial corpus ({args.pages} pages, seed {args.seed}): one hot domain
carries 30% of pages, each prepending the same entity-pair sentence (one
scorching (subj, pred, obj) aggregation key); doc lengths heavy-tailed
(1% of pages ×50-100, 4% ×8-20 — up to two decades of per-row compute
imbalance). local[{args.cores}]. Task-time numbers are Spark's own
executorRunTime quantiles (max / p50) for the heaviest stage of each
action; the mitigation target is max/p50 < 3×.

| arm | wall sec | tasks | p50 task ms | max task ms | max/p50 |
|---|---|---|---|---|---|
| extraction, naive parquet byte splits | {results['extract_naive']['wall_sec']} | {results['extract_naive']['heavy_stage']['tasks']} | {results['extract_naive']['heavy_stage']['p50_ms']:.0f} | {results['extract_naive']['heavy_stage']['max_ms']:.0f} | {results['extract_naive']['ratio']} |
| extraction, by_compute (4 tasks/core) | {results['extract_bycompute']['wall_sec']} | {results['extract_bycompute']['heavy_stage']['tasks']} | {results['extract_bycompute']['heavy_stage']['p50_ms']:.0f} | {results['extract_bycompute']['heavy_stage']['max_ms']:.0f} | {results['extract_bycompute']['ratio']} |
| triple agg, direct groupBy | {results['agg_naive']['wall_sec']} | {results['agg_naive']['heavy_stage']['tasks']} | {results['agg_naive']['heavy_stage']['p50_ms']:.0f} | {results['agg_naive']['heavy_stage']['max_ms']:.0f} | {results['agg_naive']['ratio']} |
| triple agg, salted two-phase | {results['agg_salted']['wall_sec']} | {results['agg_salted']['heavy_stage']['tasks']} | {results['agg_salted']['heavy_stage']['p50_ms']:.0f} | {results['agg_salted']['heavy_stage']['max_ms']:.0f} | {results['agg_salted']['ratio']} |

Result: mitigated extraction max/p50 = {results['extract_bycompute']['ratio']},
mitigated aggregation max/p50 = {results['agg_salted']['ratio']} —
**{"PASS" if ok else "FAIL"}** vs the < 3× target.
""")
    print("appended a skew-stress section to BENCH/BASELINE.md")
    spark.stop()


if __name__ == "__main__":
    main()
