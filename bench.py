"""Benchmark runner (driver contract: prints ONE JSON line).

Times the headline extraction job (turns/sec over a deterministic
synthetic transcript corpus — the BASELINE.md metric) plus the operator
query suite at $SPARK_GRAFT_SF_DIR.

Env:
  SPARK_GRAFT_SF_DIR   testdata dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[N] cores (default 32)
  BATUKH_BENCH_CONVS   corpus size in conversations (default 110000,
                       ~2.06M turns — the BENCH/BASELINE.md-obligated
                       >= 2M-turn headline corpus); corpus parquet is
                       generated once and cached under /tmp keyed by
                       size+seed
  BATUKH_BENCH_REPS    extraction repetitions (default 3); the headline
                       turns/sec is the MEDIAN across reps and all raw
                       samples are reported (this host is shared-tenancy
                       with 2-3x load swings; best-of-N overstates)
  BATUKH_BENCH_MODE    "all" (default) | "extract" (headline only —
                       used by BENCH/scaling.py)
  BATUKH_BENCH_SUITE_REPS  per-query suite repetitions (default 3).
                       The suite is timed in INTERLEAVED rounds (every
                       query once per round, rounds back-to-back) and
                       each query reports the MEDIAN of its reps, with
                       all raw samples in the output and appended to
                       BATUKH_BENCH_RAW_OUT — single-shot per-query
                       timings on this 4x-weather host made
                       round-over-round deltas unjudgeable (round-4
                       verdict: phantom 19->32s "regression" in
                       untouched code)
  BATUKH_BENCH_RAW_OUT JSON file the headline reps are APPENDED to as a
                       raw-sample batch (default
                       <repo>/BENCH/raw_samples_local.json; set "" to
                       disable).  Every committed headline number must
                       have its raw samples in that file — the round-3
                       claim whose samples lived only in prose did not
                       reproduce.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_CONVS = int(os.environ.get("BATUKH_BENCH_CONVS", "110000"))
REPS = int(os.environ.get("BATUKH_BENCH_REPS", "3"))
SUITE_REPS = int(os.environ.get("BATUKH_BENCH_SUITE_REPS", "3"))
MODE = os.environ.get("BATUKH_BENCH_MODE", "all")
RAW_OUT = os.environ.get(
    "BATUKH_BENCH_RAW_OUT",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "BENCH", "raw_samples_local.json"))
SEED = 42

BENCH_QUERIES = [
    "q1_pricing_summary", "q3_shipping_priority", "q5_nation_revenue",
    "top3_orders_per_cust", "sessionize_events", "dedup_exact",
    "minhash_lsh_pairs", "dedup_clusters", "simhash_adjacent_hamming",
    "simhash_candidates", "lsh_jaccard_verified", "corpus_keep_set",
    "fingerprint_winnow", "token_counts", "quality_score", "lang_id",
    "chunk_documents", "corpus_sample", "pack_sequences",
    "packed_sequences",
    "fingerprint_candidates", "incremental_keep_set", "training_mix",
    "training_batches", "pii_redact", "decontaminate",
    "decontaminate_spans", "cut_contaminated",
    "duplicated_passages", "passage_excision",
    "cosine_topk", "ivf_cluster_sizes", "srp_near_dup", "media_features",
    "video_frame_sample",
    # conversation-granularity layer (round 5)
    "conversation_docs", "loss_mask_spans", "conversation_keep_set",
    "boilerplate_turns", "repetition_loops", "train_val_split",
    "token_budget_sample", "epoch_order", "unigram_logprob",
    "trace_stats", "role_transitions", "sft_samples",
    "bigram_logprob", "sft_mix", "packed_loss_masks", "best_of_n",
    "preference_pairs", "split_leakage", "temperature_sample",
    "truncate_conversations", "merge_turns",
    "length_bucketed_batches", "vocab_coverage", "hard_negatives",
    "interleave_domains", "token_length_profile",
    "corpus_delta", "mix_report", "key_skew_report", "transition_latency",
    "c4_line_clean", "contract_audit", "dedup_lines", "embedding_audit",
    "quality_classifier", "fixed_size_sample",
    # round-6 additions
    "embedding_keep_set", "calibrated_token_profile",
    "incremental_emb_keep_set", "event_props_stats",
    "bpe_token_counts",
]
# srp_recall is excluded: its brute-force TRUTH SET is intentionally
# all-pairs (it exists to measure the banded path's recall) and runs at
# the driver's sf0.01 validation scale, not as a throughput benchmark.
# ivf_pq_topk / ivf_recall_topk are excluded for the same reason: their
# recall measurement embeds a brute-force truth set plus one-time index
# training; the serving path they exercise is lookup-only by plan test.


def corpus_path() -> str:
    return f"/tmp/batukh_bench_corpus_n{N_CONVS}_s{SEED}"


def ensure_corpus(spark) -> str:
    path = corpus_path()
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from batukh_spark.corpus import make_transcripts
        make_transcripts(spark, N_CONVS, seed=SEED) \
            .write.mode("overwrite").parquet(path)
    return path


def bench_extraction(spark) -> dict:
    """Headline: the REAL file-mode pipeline (scan -> fused kernel ->
    sorted partitioned write -> per-unit manifest) over the cached
    corpus.  Runs REPS repetitions and reports the MEDIAN turns/sec plus
    every raw sample (the shared-tenancy host swings 2-3x; a best-window
    number does not reproduce — see BENCH/BASELINE.md)."""
    import shutil
    import statistics
    import tempfile

    from pyspark.sql import functions as F
    from batukh_spark import kernels, pipeline

    path = ensure_corpus(spark)
    df = spark.read.parquet(path)
    # warmup: spawn+import the python workers so the timed runs measure
    # steady-state throughput, not process startup
    df.limit(2000).mapInArrow(
        kernels.extract_turns_lean,
        schema=kernels.lean_schema_sql(
            "conv_id string, turn_idx int, role string, tool string, "
            "ts timestamp")).count()
    # warm the page cache over the corpus parquet: rep 1 otherwise
    # measures cold-disk reads the later reps don't (round-3 driver
    # samples: 315s cold vs 98s warm on identical work)
    df.agg(F.sum(F.length("text"))).collect()

    # best-effort quiet start (bounded): this VM is shared-tenancy and
    # loadavg is broken on its kernel, so gate on /proc/stat busy frac
    def _busy(dur=2.0):
        def snap():
            v = list(map(int, open("/proc/stat").readline().split()[1:]))
            return sum(v), v[3] + v[4]
        t0, i0 = snap(); time.sleep(dur); t1, i1 = snap()
        return 1.0 - (i1 - i0) / max(1, t1 - t0)
    t_gate = time.time()
    while time.time() - t_gate < 120 and _busy() > 0.10:
        pass

    def _cpu_snap():
        v = list(map(int, open("/proc/stat").readline().split()[1:]))
        return sum(v), v[3] + v[4]

    def _tree_cpu_s() -> float:
        """CPU seconds consumed by THIS process and all live
        descendants (JVM + pyspark daemon/workers) — own-consumption
        attribution that, unlike whole-box /proc/stat, is immune to
        co-tenant load.  Long-lived processes dominate here (the JVM
        and reused python daemons); short-lived workers that die
        between snapshots are a small undercount."""
        import glob
        me = os.getpid()
        procs = {}
        for stat in glob.glob("/proc/[0-9]*/stat"):
            try:
                parts = open(stat).read().rsplit(")", 1)[1].split()
                pid = int(stat.split("/")[2])
                ppid = int(parts[1])
                cpu = (int(parts[11]) + int(parts[12])) / \
                    os.sysconf("SC_CLK_TCK")
                procs[pid] = (ppid, cpu)
            except (OSError, IndexError, ValueError):
                continue
        total, frontier = 0.0, {me}
        while frontier:
            kids = {p for p, (pp, _) in procs.items() if pp in frontier}
            total += sum(procs[p][1] for p in frontier if p in procs)
            frontier = kids
        return total

    walls, host_cores, own_cores, rows, chars, errors = [], [], [], 0, 0, 0
    busy_befores = []
    for rep in range(max(1, REPS)):
        workdir = tempfile.mkdtemp(prefix="batukh_bench_out_")
        try:
            busy_befores.append(round(_busy(), 3))
            c0_tot, c0_idle = _cpu_snap()
            o0 = _tree_cpu_s()
            t0 = time.time()
            pipeline.run_extraction(
                spark, path, f"{workdir}/out",
                metrics=f"{workdir}/metrics",
                run_id=f"bench{rep}", mode="files")
            walls.append(time.time() - t0)
            own_cores.append(round((_tree_cpu_s() - o0) / walls[-1], 2))
            c1_tot, c1_idle = _cpu_snap()
            # WHOLE-HOST cores actually consumed during the rep: in
            # local mode the shared JVM (scan, Arrow IPC, sort, codec)
            # free-rides on idle host cores beyond local[N]'s N task
            # slots, so a "2-core" run consumes more than 2 cores —
            # this measures the true capacity each level uses (a real
            # N-core executor machine has no such spare capacity)
            bf = 1.0 - (c1_idle - c0_idle) / max(1, c1_tot - c0_tot)
            host_cores.append(round(bf * (os.cpu_count() or 32), 2))
            if rep == 0:
                agg = (spark.read.parquet(f"{workdir}/out")
                       .agg(F.count(F.lit(1)).alias("rows"),
                            F.sum(F.length("extracted_text"))
                            .alias("chars"),
                            F.sum(F.when(F.col("error").isNotNull(), 1)
                                  .otherwise(0)).alias("errors"))
                       .collect()[0])
                rows, chars, errors = agg.rows, int(agg.chars), \
                    int(agg.errors)
        finally:
            shutil.rmtree(workdir, ignore_errors=True)
    med = statistics.median(walls)
    # append the headline reps to the committed raw-samples file so the
    # claimed median is always backed by on-disk samples with their
    # weather columns (BENCH/BASELINE.md rule: every raw sample committed)
    if RAW_OUT:
        try:
            per_rep = [
                {"turns": rows, "wall_s": round(w, 3),
                 "turns_per_sec": round(rows / w, 1),
                 "host_cores_busy": host_cores[i],
                 "own_cores_busy": own_cores[i],
                 "busy_before": busy_befores[i],
                 "cpus": CPUS, "n_convs": N_CONVS, "rep": i}
                for i, w in enumerate(walls)]
            batch = {
                "name": "headline_local%d_%s" % (
                    CPUS, time.strftime("%Y%m%dT%H%M%S")),
                "samples": {str(CPUS): per_rep},
                "summary": {"metric": "extraction_turns_per_sec",
                            "median_turns_per_sec": round(rows / med, 1),
                            "median_wall_s": round(med, 3),
                            "reps": len(walls)}}
            doc = json.load(open(RAW_OUT)) if os.path.exists(RAW_OUT) \
                else {"batches": []}
            doc.setdefault("batches", []).append(batch)
            tmp = RAW_OUT + ".tmp"
            with open(tmp, "w") as f:
                json.dump(doc, f, indent=1)
            os.replace(tmp, RAW_OUT)
        except Exception as e:          # never fail the bench on logging
            print(f"raw-sample append failed: {e}", file=sys.stderr)
    return {"turns": rows, "wall_s": round(med, 3),
            "turns_per_sec": round(rows / med, 1),
            "reps": len(walls),
            "wall_s_samples": [round(w, 3) for w in walls],
            "turns_per_sec_samples": [round(rows / w, 1) for w in walls],
            "host_cores_busy_samples": host_cores,
            "host_cores_busy": round(statistics.median(host_cores), 2),
            "own_cores_busy_samples": own_cores,
            "own_cores_busy": round(statistics.median(own_cores), 2),
            "extracted_chars": chars, "errors": errors,
            "cpus": CPUS, "n_convs": N_CONVS}


def main() -> int:
    from batukh_spark.session import get_spark
    spark = get_spark(app_name="batukh-bench", cores=CPUS,
                      shuffle_partitions=CPUS * 2)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        queries: dict[str, float] = {}
        t_suite0 = time.time()

        ext = bench_extraction(spark)
        queries["extract_transcripts"] = ext["wall_s"]

        query_samples: dict[str, list[float]] = {}
        if MODE == "all":
            import statistics

            from batukh_spark.queries import QUERIES
            query_samples = {name: [] for name in BENCH_QUERIES}
            # interleaved rounds: each query's reps are separated in
            # time, so per-query medians absorb the host's documented
            # multi-x weather instead of sampling one moment.
            # Forcing is a NOOP-SINK WRITE, not count(): count() prunes
            # every unreferenced column, so a narrow per-doc query
            # "measured" a no-op scan (round-3 note; confirmed round 5
            # when the pruned timings hid a 100x interpreted-HOF cost).
            # The noop sink materializes every output column.
            for _rnd in range(max(1, SUITE_REPS)):
                for name in BENCH_QUERIES:
                    fn, _sql = QUERIES[name]
                    t0 = time.time()
                    fn(spark, SF_DIR).write.format("noop") \
                        .mode("overwrite").save()
                    query_samples[name].append(round(time.time() - t0, 3))
            queries.update({n: round(statistics.median(s), 3)
                            for n, s in query_samples.items()})

        total = round(time.time() - t_suite0, 3)
        result = {
            "metric": "bench_suite_wall",
            "value": total,
            "unit": "sec",
            "queries": queries,
            "query_samples": query_samples,
            "suite_reps": SUITE_REPS if MODE == "all" else 0,
            # round-5 change: suite queries are forced via a noop-sink
            # write (all columns materialize); earlier rounds used
            # count(), which column-prunes — per-query timings are NOT
            # comparable across that boundary
            "suite_forcing": "noop-write",
            "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
            # headline engine metric (BASELINE.md): extracted turns/sec
            "turns_per_sec": ext["turns_per_sec"],
            "extraction": ext,
        }
        if MODE == "all" and RAW_OUT:
            try:
                doc = json.load(open(RAW_OUT)) if os.path.exists(RAW_OUT) \
                    else {"batches": []}
                doc.setdefault("batches", []).append({
                    "name": "suite_local%d_%s" % (
                        CPUS, time.strftime("%Y%m%dT%H%M%S")),
                    "sf": result["sf"],
                    "suite_reps": SUITE_REPS,
                    "query_samples": query_samples})
                tmp = RAW_OUT + ".tmp"
                with open(tmp, "w") as f:
                    json.dump(doc, f, indent=1)
                os.replace(tmp, RAW_OUT)
            except Exception as e:      # never fail the bench on logging
                print(f"raw-sample append failed: {e}", file=sys.stderr)
        print(json.dumps(result))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
