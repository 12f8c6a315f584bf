"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE compact JSON line: {"metric": ..., "value": total_sec, "unit":
"sec", "queries": {name: sec, ...}, "sf": ...} — printed TWICE
(consecutive identical lines) so any fixed-size tail capture window
holds at least one complete copy, and kept small: the per-query
spreads and protocol notes that grew the round-6 line past the
driver's tail window (BENCH_r06.json came back ``parsed: null``) now
go to ``bench_detail.json`` next to this script instead of stdout.

Fixed protocol (round-2 verdict item #10, tightened per the round-4
verdict's heavy-tail item and the round-6 verdict's >10%-spread
finding on graph_triangle_count): one warmup execution per query
(pays plan + codegen compile), then best-of-3 timed runs — escalated
to best-of-5 when the 3-run best exceeds 2s (the heavy tail had
0.5-0.8s best-of-3 spreads in r4, up to 25% of wall), and to
best-of-7 when a heavy query is still unstable after 5 (runner-up gap
> 5% of the best). The reported value is the MIN, so ``spread``
records the runner-up gap (2nd-best minus best): that is the
empirical uncertainty of the reported statistic — max-min over N runs
only grows with N and measured the slowest outlier, not the
stability of the number being compared across rounds.

Each query materializes fully via the noop sink (forces end-to-end
execution incl. all expressions, without sink I/O or driver-collect
skew).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from chiv_spark.queries import REGISTRY
from chiv_spark.session import get_spark

def _compact_line(out: dict, limit: int = 1800) -> str:
    """Serialize ``out`` for stdout, shrinking ``queries`` to the
    slowest rows until the line fits under ``limit`` bytes.

    The full per-query map lives in bench_detail.json; the stdout line
    exists only to feed the driver's 2000-char tail window, so it keeps
    the headline total exact and trades per-query completeness for a
    guaranteed fit. ``queries_shown``/``queries_total`` record the
    truncation explicitly so a reader never mistakes top-N for all.
    """
    full = json.dumps(out, separators=(",", ":"))
    if len(full) < limit:
        return full
    ranked = sorted(out["queries"].items(), key=lambda kv: -kv[1])
    for n in range(len(ranked), 0, -1):
        slim = dict(out)
        slim["queries"] = dict(sorted(ranked[:n]))
        slim["queries_shown"] = n
        slim["queries_total"] = len(ranked)
        line = json.dumps(slim, separators=(",", ":"))
        if len(line) < limit:
            return line
    slim = {k: v for k, v in out.items() if k != "queries"}
    slim["queries_total"] = len(out["queries"])
    return json.dumps(slim, separators=(",", ":"))


HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_revenue_by_nation",
    "q6_forecast_revenue",
    "join_inner_agg",
    "window_rank_topn",
    "window_running_sum",
    "sort_topk",
    "scalar_json_funcs",
    "events_sessionize",
    "text_stats",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "embedding_neardup",
    "ann_cosine_topk",
    # round 4 additions: deep multi-join (Q9), lexical retrieval,
    # corpus-quality signals, degree-ordered triangle counting
    "q9_profit_by_nation_year",
    "text_bm25_topk",
    "text_quality_filter",
    "graph_triangle_count",
    # round 4, second batch: exact-verified n-gram Jaccard (the
    # heaviest dedup tier) and distributed global row numbering
    "dedup_ngram_jaccard",
    "transform_global_row_ids",
    # round 4, closing batch: cluster-bounded semantic dedup and
    # corpus-trained bigram-LM perplexity scoring (the two heaviest
    # late-round curation additions)
    "dedup_semdedup",
    "text_lm_perplexity",
    # round 5 additions: sub-document repeated-window dedup (the
    # token-explode heavy tier), 2-pass Misra-Gries exact heavy
    # hitters (mapInPandas sketch + broadcast-semi verify), and the
    # bin-bucketed interval overlap join
    "dedup_repeated_ngrams",
    "text_heavy_hitters",
    "join_interval_bucketed",
    # round 6: the sketch tier — HLL rolling MAU (explodes sketches,
    # not user-days) and the DataFrame-native Count-Min sketch
    "events_active_users_mau_approx",
    "text_freq_cms",
    # round 6, second batch: PQ-ADC vector search (hash-seeded
    # codebook training + encode + table-lookup search end to end)
    # and the prefix-filtered containment dedup
    "ann_pq_adc_topk",
    "dedup_ngram_containment",
    # round 7: the production ANN layout — IVFADC with exact re-rank
    # (coarse assign + residual PQ + 6-probe ADC + top-50 exact pass)
    "ann_ivfpq_topk",
    # round 8: the growing-corpus production shapes — delta-vs-index
    # incremental dedup, cluster-fate leakage-safe splitting (composes
    # connected components), and stratum-keyed filtered vector search
    "dedup_incremental_lsh",
    "split_leakage_safe",
    "ann_filtered_topk",
    # round 9: perceptual-hash image dedup (real PNG codec round-trip
    # feeding the Hamming-chunk join), the stage-2 quarantined-bucket
    # rescue (the bucket_cap dial's recall-recovery pass), and the
    # embedding twin of delta-vs-index incremental dedup
    "dedup_image_phash",
    "dedup_lsh_quarantine_rescue",
    "dedup_incremental_embed",
    # round 10: the full ExactSubstr suffix-ranking dedup (the
    # heaviest new tier: log-rounds of iterative exchanges + the LCP
    # descent), incremental IVFPQ encode against frozen artifacts,
    # broadcast near-dup eval decontamination, and image
    # keep-one-per-cluster (phash pairs -> components -> canonical)
    "dedup_exact_substr",
    "ann_ivfpq_incremental",
    "decontaminate_neardup_eval",
    "dedup_image_canonical",
    # round 12: ExactSubstr trimming iterated to fixpoint (runs the
    # suffix-ranking span detector up to MAX_TRIM_ROUNDS+1 times on
    # the repeat-candidate subcorpus — the round-over-round cost
    # curve the r11 verdict asked to make visible), search against
    # the persisted IVFPQ codes index through a deletion, and the
    # audio fingerprint chain (real WAV decode -> Hamming-chunk join)
    "dedup_exact_substr_fixpoint",
    "ann_delete_then_probe",
    "dedup_audio_fingerprint",
    # round 13: the r12/r13 tail the verdict asked to make visible —
    # paragraph-level exact dedup (two linear fingerprint hash-aggs +
    # rebuild), bloom membership over the packed broadcast bitmap,
    # incremental ExactSubstr vs the persisted 8-gram window index,
    # drift-acting IVFPQ maintenance (train + measure + partial
    # rewrite per run), incremental paragraph dedup against the
    # fingerprint index, and the video temporal-dHash dedup chain
    # (real GIF decode of 61 sampled frames per clip)
    "dedup_paragraph_exact",
    "dedup_bloom_membership",
    "dedup_incremental_exact_substr",
    "ann_ivfpq_maintenance",
    "dedup_incremental_paragraph",
    "dedup_video_fingerprint",
    # round 14: the r13 tail the verdict asked to make visible —
    # the cross-modality capstone (composes eight registered stage
    # relations), video keep-one-per-cluster, the streaming suffix
    # fold twin, and the bloom false-positive audit — plus this
    # round's additions: incremental media dedup vs the persisted
    # chunk index (image/audio/video — codec on the delta only),
    # the suffix-store deletion lifecycle (two probes through
    # tombstones), the bounded capped fuzzy join, and the capstone
    # survivors' dataset card
    "pipeline_curation_capstone",
    "dedup_video_canonical",
    "streaming_incremental_exact_substr",
    "dedup_bloom_fpr_report",
    "dedup_incremental_phash",
    "dedup_incremental_audio",
    "dedup_incremental_video",
    "exact_substr_delete_then_probe",
    "join_fuzzy_levenshtein_capped",
    "pipeline_capstone_dataset_card",
    # round 14, second batch: the curation additions beyond the r13
    # verdict list — df-threshold boilerplate removal (+ its
    # incremental twin against the paragraph index), the two-level
    # domain quality gate, the training-shard manifest, and the
    # streaming heavy-hitters candidate fold's static-corpus shape
    "dedup_paragraph_boilerplate",
    "dedup_incremental_boilerplate",
    "quality_domain_gate",
    "mlprep_shard_manifest",
    "mlprep_snapshot_diff",
    "streaming_domain_stats",
    "pipeline_quality_funnel",
    # round 15: the media-tier deletion lifecycle (r14 verdict task 3)
    # and the counter-store domain gate (task 5)
    "media_delete_then_probe",
    "quality_domain_gate_incremental",
    "pipeline_quality_funnel_chained",
    "join_fuzzy_cap_autotune",
    # round 16: the composed delta-cost ingest capstone (flags + card,
    # both WARM — state seeded by the untimed warmup, so the number
    # is the per-shard ARRIVAL cost, the row's whole claim; the seed
    # pass is the capstone-cold class already benched above), the
    # cluster-output fuzzy formulation + its member-recall gate, the
    # autotune-wired capped join, and the compacted domain gate
    "pipeline_incremental_ingest",
    "pipeline_incremental_ingest_card",
    "join_fuzzy_cluster_assign",
    "join_fuzzy_cluster_recall",
    "join_fuzzy_at_autotuned_cap",
    "quality_domain_gate_compacted",
    # round 17: the composed-state takedown lifecycle (r16 verdict
    # task 2; each timed run pays copy+forget+compact+2 probes — the
    # lifecycle IS the cost being measured) and the persisted-codes
    # ANN probe twin (task 4; WARM — codes seeded once by the untimed
    # warmup, so the number is probe+re-rank cost, the row's claim)
    "ingest_delete_then_probe",
    "ann_ivfpq_topk_persisted",
]


def _bench_one(run) -> tuple[float, float]:
    """One untimed warmup, then best-of-3 → 5 → 7 escalation (see
    module docstring). Returns (best_sec, runner_up_gap_sec)."""
    run()
    runs: list[float] = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        runs.append(time.perf_counter() - t0)
    # heavy tail (>2s wall, where r4 saw 0.5-0.8s spreads) or a
    # runner-up gap above 10% of the best (light queries where 3 reps
    # happened to straddle a GC/compile hiccup)
    if min(runs) > 2.0 or sorted(runs)[1] - min(runs) > 0.10 * min(runs):
        for _ in range(2):
            t0 = time.perf_counter()
            run()
            runs.append(time.perf_counter() - t0)
    # r6 verdict task 7: a heavy query still >5%-unstable after 5 reps
    # (graph_triangle_count's 11.3% judge-rerun gap) gets 2 more
    if min(runs) > 2.0 and sorted(runs)[1] - min(runs) > 0.05 * min(runs):
        for _ in range(2):
            t0 = time.perf_counter()
            run()
            runs.append(time.perf_counter() - t0)
    ordered = sorted(runs)
    return round(ordered[0], 3), round(ordered[1] - ordered[0], 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark("chiv-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JVM + codegen + parquet footer caches
    try:
        REGISTRY["scan_full_table"].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    except Exception:  # noqa: BLE001 — per-query warmups still run
        pass

    timings: dict[str, float] = {}
    spread: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        # one untimed warmup (plan + codegen compile), then best-of-3
        # steady-state runs; record max-min as the noise estimate.
        # Each query is individually fenced: one broken query must not
        # zero the whole round's bench (round-3 lesson — the NTZ break
        # at events_sessionize's warmup killed every number).
        try:
            fn = REGISTRY[name].fn
            # the capstone's flags relation is memoized per (session,
            # sf_dir) since r15 — benching it warm would report the
            # cached read, not the stage stack. The capstone row is
            # therefore timed COLD (cache cleared before every run)
            # and the dataset card, which by design consumes the
            # capstone's persisted flags, stays warm: the pair's
            # combined number is one flag build + one cached read —
            # exactly the designed usage (r14 verdict task 2).
            clear_capstone = name == "pipeline_curation_capstone"

            def _run(fn=fn, clear=clear_capstone):
                if clear:
                    from chiv_spark.queries.mlprep import _CAPSTONE_CACHE

                    for flags, cans in _CAPSTONE_CACHE.values():
                        flags.unpersist()
                        for c in cans.values():
                            c.unpersist()
                    _CAPSTONE_CACHE.clear()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

            timings[name], spread[name] = _bench_one(_run)
        except Exception as exc:  # noqa: BLE001 — record and continue
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]

    # skew profile (r5 verdict task 5): the uniform-SF numbers above
    # can't see hot-key regressions, so one headline entry runs the
    # skew-resilient attribution on a generated hot-key table — one
    # bot user emitting 100k events (1500x the sf0.1 per-user mean)
    # plus the sf0.1-shaped tail. Generation is untimed; both the
    # skew-safe and the plain single-partition-window variants are
    # timed so the gap (and any regression in it) is visible
    # round-over-round.
    import shutil
    import tempfile

    skew_dir = tempfile.mkdtemp(prefix="chiv-bench-skew-")
    try:
        from pyspark.sql import functions as F

        base_ts = "TIMESTAMP '2024-03-01 00:00:00'"
        hot = spark.range(100_000).select(
            F.lit(1).alias("user_id"),
            F.expr(f"{base_ts} + make_interval(0,0,0,0,0,0, id*13)").alias("ts"),
            (F.col("id") + 1_000_000).alias("event_id"),
            F.expr("element_at(array('view','click','purchase','view','click'), CAST(id % 5 AS INT) + 1)").alias("event_type"),
            F.lit(1.0).alias("value"),
            F.lit("{}").alias("props"),
        )
        tail = spark.range(30_000).select(
            (F.col("id") % 1500 + 2).alias("user_id"),
            F.expr(f"{base_ts} + make_interval(0,0,0,0,0,0, id*37)").alias("ts"),
            (F.col("id") + 5_000_000).alias("event_id"),
            F.expr("element_at(array('view','click','purchase','view','click'), CAST(id % 5 AS INT) + 1)").alias("event_type"),
            F.lit(1.0).alias("value"),
            F.lit("{}").alias("props"),
        )
        hot.unionByName(tail).write.mode("overwrite").parquet(f"{skew_dir}/events.parquet")
        for bench_name, qname in (
            ("attribution_last_touch_skewed", "events_attribution_last_touch_scalable"),
            ("attribution_last_touch_skewed_plain", "events_attribution_last_touch"),
        ):
            try:
                fn = REGISTRY[qname].fn

                def _run(fn=fn):
                    fn(spark, skew_dir).write.format("noop").mode("overwrite").save()

                timings[bench_name], spread[bench_name] = _bench_one(_run)
            except Exception as exc:  # noqa: BLE001
                errors[bench_name] = f"{type(exc).__name__}: {exc}"[:300]
    except Exception as exc:  # noqa: BLE001
        errors["skew_bench"] = f"{type(exc).__name__}: {exc}"[:300]
    finally:
        shutil.rmtree(skew_dir, ignore_errors=True)

    # adversarial-replica rows (r9 verdict task 6): the organic sf0.1
    # corpus never saturates an LSH bucket, so the rescue stage is
    # ~free in the uniform numbers above and a regression in it (or in
    # the delta-vs-index embed fold under dense buckets) would be
    # invisible round-over-round. Standing 4x near-dup replica of the
    # benched sf_dir (every doc + 3 variants -> every replica group
    # saturates cap=3 and hits the rescue path; every embedding
    # duplicated verbatim -> dense sign-buckets for the delta join).
    # Generation is untimed, like the hot-key table.
    replica_dir = tempfile.mkdtemp(prefix="chiv-bench-replica-")
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
        from probe_scale import build_replicas

        build_replicas(spark, sf_dir, replica_dir, scale=4)
        for bench_name, qname in (
            ("dedup_rescue_adversarial_4x", "dedup_lsh_quarantine_rescue"),
            ("dedup_incremental_embed_adversarial_4x", "dedup_incremental_embed"),
        ):
            try:
                fn = REGISTRY[qname].fn

                def _run(fn=fn):
                    fn(spark, replica_dir).write.format("noop").mode("overwrite").save()

                timings[bench_name], spread[bench_name] = _bench_one(_run)
            except Exception as exc:  # noqa: BLE001
                errors[bench_name] = f"{type(exc).__name__}: {exc}"[:300]
    except Exception as exc:  # noqa: BLE001
        errors["replica_bench"] = f"{type(exc).__name__}: {exc}"[:300]
    finally:
        shutil.rmtree(replica_dir, ignore_errors=True)

    # archive throughput — the reference's core operation (extract →
    # format → load, chiv.go:121-143): single-object streaming parity
    # path and the distributed scale path, lineitem → CSV

    from chiv_spark.core.archiver import Archiver
    from chiv_spark.sources.catalog import read_table

    bucket = tempfile.mkdtemp(prefix="chiv-bench-")
    try:
        li = read_table(spark, sf_dir, "lineitem")
        a = Archiver(spark)
        # real-disk writes are the noisiest entries on this box: one
        # untimed warmup then best-of-3 with the runner-up-gap spread,
        # same protocol rationale as the query loop (the r4 bench
        # drift was entirely archive IO)
        def _archive_dist():
            a.archive_df(li, bucket, key="lineitem_dist.csv", distributed=True)

        def _archive_single():
            a.archive_df(li.limit(100_000), bucket, key="lineitem_single.csv")

        # r6: JSON/YAML single-object sinks got the executor-side fast
        # path; benched at the same 100k rows as the CSV entry so the
        # speedup vs the r5 driver row loop is visible
        def _archive_json_single():
            a.archive_df(li.limit(100_000), bucket, key="lineitem_single.json", format="json")

        def _archive_yaml_single():
            a.archive_df(li.limit(100_000), bucket, key="lineitem_single.yaml", format="yaml")

        for name, fn in (
            ("archive_csv_distributed", _archive_dist),
            ("archive_csv_single_100k", _archive_single),
            ("archive_json_single_100k", _archive_json_single),
            ("archive_yaml_single_100k", _archive_yaml_single),
        ):
            timings[name], spread[name] = _bench_one(fn)
    except Exception as exc:  # noqa: BLE001
        errors["archive_csv"] = f"{type(exc).__name__}: {exc}"[:300]
    finally:
        shutil.rmtree(bucket, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if errors:
        out["errors"] = errors
    # full detail (spreads, protocol) goes to a side file, NOT stdout:
    # the r6 stdout line outgrew the driver's tail capture window and
    # came back parsed:null — the compact line + side file keeps the
    # driver's perf gate fed while preserving the evidence trail
    detail = dict(out)
    detail["spread"] = spread
    detail["protocol"] = (
        "warmup+best-of-3 (best-of-5 when >2s; best-of-7 when >2s and "
        "gap>5% after 5); spread=runnerup-gap"
    )
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_detail.json"), "w") as fh:
            json.dump(detail, fh, indent=1)
            fh.write("\n")
    except OSError:
        pass  # read-only checkout: the stdout line still carries the result
    # The driver's tail capture is 2000 chars; at 75 headline rows the
    # full-map line hit 2379 bytes and BENCH_r14.json came back
    # parsed:null. The compact stdout line therefore carries only the
    # top-N slowest rows (the full map is already in bench_detail.json)
    # and is hard-gated under 1900 bytes so growth can never silently
    # break the driver's perf gate again (RuntimeError, not assert:
    # python -O must not strip the gate — r15 advice, bench.py:438).
    line = _compact_line(out)
    if len(line) >= 1900:
        raise RuntimeError(f"compact bench line {len(line)}B >= 1900B")
    # printed twice so a fixed-size tail window that starts mid-line
    # still contains one complete copy
    print(line)
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
