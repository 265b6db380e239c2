#!/usr/bin/env python
"""Multi-executor smoke: run registry queries on a REAL standalone
cluster (separate master/worker/executor JVMs), not local[N].

local[N] hides a class of bugs that only exist once executors are
separate processes: closure-serialization failures, Python-worker
import paths on executors, shuffle over real netty transport,
reliable-checkpoint visibility across JVMs. This script launches a
2-worker standalone cluster on the current machine with the
`spark-class` launcher every PySpark install ships, runs a
representative query slice against it WITH value verification (DuckDB
oracle — identical to the correctness gate), and tears the cluster
down. On a real multi-node deployment the same flow applies — see
docs/cluster-smoke.md for the spark-submit form.

Usage:
    python scripts/cluster_smoke.py            # sf0.001 slice
    SPARK_GRAFT_SMOKE_SF_DIR=... SPARK_GRAFT_SMOKE_QUERIES=tpch_q1_pricing_summary,... \
        python scripts/cluster_smoke.py

Exit code 0 iff every smoke query matched its oracle.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MASTER_PORT = int(os.environ.get("SPARK_GRAFT_SMOKE_MASTER_PORT", "7077"))
SF_DIR = os.environ.get("SPARK_GRAFT_SMOKE_SF_DIR", "/root/testdata/sf0.001")
# One per family with distinct failure surfaces: scan+agg, 3-way join,
# exact-ranking (persisted shared exchange), iterative graph (reliable
# checkpoint ACROSS JVMs), LSH dedup (HOF + bucket collect), ANN
# (Arrow mapInPandas on executors).
DEFAULT_QUERIES = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "window_rank_distribution",
    "graph_pagerank_trade",
    "graph_pagerank_after_ingest",
    "dedup_minhash_lsh_pairs",
    "embed_ann_brute_topk",
]


class PhaseTimeout(Exception):
    pass


def _run_phase(spark, label: str, fn, timeout_s: float) -> str:
    """Run one smoke phase under a HARD wall-clock deadline.

    Pin of the r10 kill-loop deadlock class (docs/cluster-smoke.md:
    the count-based executor wait could deadlock with spark.cores.max
    saturated; fixed via address-set tracking): a future regression of
    that shape must FAIL the smoke, not hang it. The phase runs in a
    true DAEMON thread — not a ThreadPoolExecutor worker, whose
    non-daemon thread concurrent.futures joins at interpreter exit,
    which would turn a phase hung in a pure-Python loop (the exact
    deadlock class this pins) back into a process that never exits.

    Cancellation on deadline (ADVICE r11 #3, stated precisely): the
    phase thread runs under its own job group
    (`setJobGroup(interruptOnCancel=True)` is thread-local under
    pinned-thread PySpark), and the handler first cancels THAT group
    — killing the hung phase's own in-flight jobs by name — then
    calls `cancelAllJobs()` as the sweep for work the group cannot
    reach (jobs submitted by the phase's NESTED threads or by a
    streaming engine's micro-batch thread, which carry no group). The
    sweep is safe at this instant because phases run strictly
    sequentially: no later phase has submitted anything yet. What
    neither call can stop is the abandoned daemon thread SUBMITTING
    NEW jobs afterwards — so the timeout is recorded in `_ABANDONED`
    and every later phase failure is annotated with it, letting a
    reader attribute interference instead of chasing a phantom.
    """
    import threading

    result: dict = {}
    group = f"smoke-{label}"

    def _target():
        try:
            # Job-group is thread-local in the Py4J-backed context,
            # so set it INSIDE the phase thread; interruptOnCancel
            # makes a cancel abort running tasks, not just queued.
            spark.sparkContext.setJobGroup(group, label, interruptOnCancel=True)
            result["value"] = fn()
        except BaseException as exc:  # noqa: BLE001 — reraised below
            result["error"] = exc

    t = threading.Thread(target=_target, name=group, daemon=True)
    t.start()
    t.join(timeout=timeout_s)
    if t.is_alive():
        spark.sparkContext.cancelJobGroup(group)
        spark.sparkContext.cancelAllJobs()  # nested/stream threads have no group
        _ABANDONED.append(label)
        raise PhaseTimeout(
            f"phase exceeded {timeout_s:.0f}s deadline (job group "
            f"{group!r} + all in-flight jobs cancelled; its daemon "
            f"thread is abandoned and may still submit work)"
        )
    if "error" in result:
        raise result["error"]
    return result["value"]


# Labels of phases whose deadline expired: their abandoned daemon
# threads share the SparkSession, so later failures are annotated.
_ABANDONED: list = []


def _taint_note() -> str:
    return (
        f" [abandoned phase threads live: {','.join(_ABANDONED)}]"
        if _ABANDONED
        else ""
    )


def _spark_home() -> str:
    import pyspark

    return os.path.dirname(os.path.abspath(pyspark.__file__))


def _wait_port(port: int, timeout: float = 60.0) -> None:
    deadline = time.time() + timeout
    while time.time() < deadline:
        with socket.socket() as s:
            if s.connect_ex(("127.0.0.1", port)) == 0:
                return
        time.sleep(0.5)
    raise TimeoutError(f"port {port} never opened")


def _spawn(cls: str, *args: str) -> subprocess.Popen:
    env = dict(os.environ)
    env["SPARK_HOME"] = _spark_home()
    env.setdefault("SPARK_NO_DAEMONIZE", "1")
    # executors' python workers must resolve the engine package
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.Popen(
        [os.path.join(_spark_home(), "bin", "spark-class"), cls, *args],
        env=env,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )


STREAM_GOLD_ORACLE = """
    SELECT
      time_bucket(INTERVAL '15 minutes', ts) AS window_start,
      time_bucket(INTERVAL '15 minutes', ts) + INTERVAL '15 minutes' AS window_end,
      event_type,
      round(avg(value), 6) AS avg_value,
      count(*) AS n_events
    FROM events
    GROUP BY 1, 2, 3
"""


def _streaming_smoke(spark) -> str:
    """Watermarked windowed aggregation over a FILE-SOURCE STREAM with
    a parquet sink, on the real cluster (VERDICT r7 #9): the
    HDFSBackedStateStore (window-agg state), watermark advancement,
    and streaming parquet commit log all execute across separate
    executor JVMs, then the SINK CONTENTS are oracle-checked against
    DuckDB over the same events — identical rigor to the batch slice.

    Append mode only emits watermark-CLOSED windows, so the replay
    ends with a far-future sentinel file: its batch advances the
    watermark past every real window (the engine's no-data batch then
    flushes them), while the sentinel's own window can never close
    and is filtered by its marker event_type.
    """
    import pandas as pd
    from pyspark.sql import functions as F

    from real_time_data_pipeline_spark.sources.tables import load_table
    from real_time_data_pipeline_spark.streaming.pipeline import (
        default_gold_aggs,
        gold_transform,
        silver_transform,
    )
    from real_time_data_pipeline_spark.streaming.sinks import parquet_append_sink
    from real_time_data_pipeline_spark.streaming.sources import file_stream
    from tests.oracle import assert_matches

    work = tempfile.mkdtemp(prefix="rtdp-smoke-stream-")
    replay, out, ck = f"{work}/replay", f"{work}/gold", f"{work}/ck"
    os.makedirs(replay)
    ev = load_table(spark, SF_DIR, "events").orderBy("ts")
    pdf = ev.toPandas()
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    chunk = (len(pdf) + 3) // 4
    for i in range(4):
        part = pdf.iloc[i * chunk : (i + 1) * chunk]
        if len(part):
            part.to_parquet(os.path.join(replay, f"b{i}.parquet"), index=False)
        time.sleep(0.05)  # distinct mtimes keep file-source order stable
    sent = pdf.iloc[:1].copy()
    # keep datetime64[us]: the Timedelta arithmetic promotes to [ns],
    # and a NANOS parquet column would break the fixed-schema stream
    sent["ts"] = (pdf["ts"].max() + pd.Timedelta(days=365)).as_unit("us")
    sent["event_type"] = "___sentinel"
    sent.to_parquet(os.path.join(replay, "b9_sentinel.parquet"), index=False)

    stream = file_stream(spark, replay, ev.schema, max_files_per_trigger=1)
    gold = gold_transform(
        silver_transform(stream, "ts"),
        "ts", "15 minutes", ["event_type"],
        {
            "avg_value": F.round(F.avg("value"), 6),
            "n_events": F.count(F.lit(1)),
        },
        watermark_delay="30 minutes",
    )
    q = parquet_append_sink(gold, out, ck, "smoke_stream_gold")
    q.processAllAvailable()
    q.stop()
    got = spark.read.parquet(out).where(F.col("event_type") != "___sentinel")
    assert_matches(got, STREAM_GOLD_ORACLE, SF_DIR)
    return "oracle-match"


def _retention_ingest_smoke(spark) -> str:
    """Incremental retention-cohort ingest on the real cluster (r9):
    the foreachBatch keyed upsert (temp-dir + rename swap) and the
    first_seen min-merge run across separate executor JVMs against a
    shared filesystem, then the derived matrix is oracle-checked
    against the batch `event_retention_cohorts` DuckDB oracle — the
    incremental state must reproduce the full-rescan answer exactly.
    """
    from real_time_data_pipeline_spark.queries import REGISTRY
    from real_time_data_pipeline_spark.sources.tables import load_table
    from real_time_data_pipeline_spark.streaming.retention_ingest import (
        retention_ingest_sink,
        retention_matrix,
    )
    from real_time_data_pipeline_spark.streaming.sources import file_stream
    from tests.oracle import assert_matches

    work = tempfile.mkdtemp(prefix="rtdp-smoke-retention-")
    replay, state, ck = f"{work}/replay", f"{work}/state", f"{work}/ck"
    os.makedirs(replay)
    ev = load_table(spark, SF_DIR, "events").orderBy("ts")
    pdf = ev.toPandas()
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    chunk = (len(pdf) + 3) // 4
    for i in range(4):
        part = pdf.iloc[i * chunk : (i + 1) * chunk]
        if len(part):
            part.to_parquet(os.path.join(replay, f"b{i}.parquet"), index=False)
        time.sleep(0.05)
    stream = file_stream(spark, replay, ev.schema, max_files_per_trigger=1).select(
        "user_id", "ts"
    )
    q = retention_ingest_sink(stream, state, ck)
    q.processAllAvailable()
    q.stop()
    got = retention_matrix(spark, state)
    assert_matches(got, REGISTRY["event_retention_cohorts"].oracle, SF_DIR)
    return "oracle-match"


def _countmin_ingest_smoke(spark) -> str:
    """Incremental Count-Min heavy-hitters maintenance on the real
    cluster (r10): the documents table is replayed as a 3-file stream
    through the foreachBatch sketch merge across separate executor
    JVMs, then the registry query's output frame is rebuilt with the
    `cm_estimate` column taken from the MAINTAINED STATE instead of
    the one-shot batch sketch — and that frame must still match the
    batch query's DuckDB oracle exactly (Count-Min linearity: the
    incremental cells equal the batch cells, so the probe estimates
    are bit-identical).
    """
    from real_time_data_pipeline_spark.queries import REGISTRY
    from real_time_data_pipeline_spark.sources.tables import load_table
    from real_time_data_pipeline_spark.streaming.countmin_ingest import (
        countmin_ingest_sink,
        heavy_hitters_estimate,
    )
    from real_time_data_pipeline_spark.streaming.sources import file_stream
    from tests.oracle import assert_matches

    from pyspark.sql import functions as F

    work = tempfile.mkdtemp(prefix="rtdp-smoke-countmin-")
    replay, state, ck = f"{work}/replay", f"{work}/state", f"{work}/ck"
    os.makedirs(replay)
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    for i in range(3):
        docs.where(F.pmod("doc_id", F.lit(3)) == i).coalesce(1).write.parquet(
            os.path.join(replay, f"b{i}.parquet")
        )
    # each write.parquet target is a DIRECTORY — glob down into them,
    # or the file source sees zero files (no recursiveFileLookup)
    stream = file_stream(spark, f"{replay}/*", docs.schema, max_files_per_trigger=1)
    q = countmin_ingest_sink(stream, state, ck)
    q.processAllAvailable()
    q.stop()
    batch = REGISTRY["text_countmin_heavy_hitters"].fn(spark, SF_DIR)
    probe = heavy_hitters_estimate(spark, state, batch.select("word"))
    got = (
        batch.drop("cm_estimate")
        .join(probe, "word")
        .select("word", "exact_count", "cm_estimate", "rk")
    )
    assert_matches(got, REGISTRY["text_countmin_heavy_hitters"].oracle, SF_DIR)
    return "oracle-match (estimates from incrementally maintained state)"


def _hll_ingest_smoke(spark) -> str:
    """Incremental HyperLogLog cardinality maintenance on the real
    cluster (r10): the documents table is replayed as a 3-file stream
    through the foreachBatch register max-merge across separate
    executor JVMs; the maintained register table must be
    cell-identical to the one-shot batch build (max-merge is
    idempotent and order-free), and the derived estimate must equal
    the batch estimate and sit within the published ~1.04/sqrt(m)
    error of the exact distinct word count."""
    from real_time_data_pipeline_spark.operators.text import words
    from real_time_data_pipeline_spark.sources.tables import load_table
    from real_time_data_pipeline_spark.streaming.hll_ingest import (
        hll_estimate,
        hll_estimate_of,
        hll_ingest_sink,
        hll_register_increments,
        read_registers,
    )
    from real_time_data_pipeline_spark.streaming.sources import file_stream

    from pyspark.sql import functions as F

    work = tempfile.mkdtemp(prefix="rtdp-smoke-hll-")
    replay, state, ck = f"{work}/replay", f"{work}/state", f"{work}/ck"
    os.makedirs(replay)
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    for i in range(3):
        docs.where(F.pmod("doc_id", F.lit(3)) == i).coalesce(1).write.parquet(
            os.path.join(replay, f"b{i}.parquet")
        )
    stream = file_stream(spark, f"{replay}/*", docs.schema, max_files_per_trigger=1)
    q = hll_ingest_sink(stream, state, ck)
    q.processAllAvailable()
    q.stop()
    got = {tuple(r) for r in read_registers(spark, state).collect()}
    want = {tuple(r) for r in hll_register_increments(docs).collect()}
    assert got == want and len(got) > 0, "register table != batch build"
    est = hll_estimate(spark, state)
    assert est == hll_estimate_of(hll_register_increments(docs))
    exact = docs.select(F.explode(words("text")).alias("w")).distinct().count()
    assert abs(est - exact) / exact < 0.05, f"estimate {est} vs exact {exact}"
    return (
        f"register-parity + estimate {est:.0f} vs exact {exact} "
        f"({abs(est - exact) / exact:.1%} err)"
    )


def _histogram_ingest_smoke(spark) -> str:
    """Incremental quantile maintenance on the real cluster (r10): the
    events table's value column is replayed as a 3-file stream through
    the foreachBatch sum-merge across separate executor JVMs; the
    maintained (bucket, cnt) table must be cell-identical to the
    one-shot batch build (fixed boundaries make the histogram linear),
    the read-time quantile estimates must equal the batch-histogram
    estimates, and each estimate must sit within the constant relative
    bucket error of the EXACT percentile."""
    from real_time_data_pipeline_spark.sources.tables import load_table
    from real_time_data_pipeline_spark.streaming.histogram_ingest import (
        LOG2_DIVS,
        histogram_increments,
        histogram_ingest_sink,
        quantile_estimates,
        quantile_estimates_of,
        read_histogram,
    )
    from real_time_data_pipeline_spark.streaming.sources import file_stream

    from pyspark.sql import functions as F

    work = tempfile.mkdtemp(prefix="rtdp-smoke-hist-")
    replay, state, ck = f"{work}/replay", f"{work}/state", f"{work}/ck"
    os.makedirs(replay)
    ev = load_table(spark, SF_DIR, "events").select("event_id", "value")
    for i in range(3):
        ev.where(F.pmod("event_id", F.lit(3)) == i).coalesce(1).write.parquet(
            os.path.join(replay, f"b{i}.parquet")
        )
    stream = file_stream(spark, f"{replay}/*", ev.schema, max_files_per_trigger=1)
    q = histogram_ingest_sink(stream, state, ck)
    q.processAllAvailable()
    q.stop()
    got = {tuple(r) for r in read_histogram(spark, state).collect()}
    want = {tuple(r) for r in histogram_increments(ev).collect()}
    assert got == want and len(got) > 0, "histogram cells != batch build"
    qs = [0.5, 0.9, 0.99]
    est = {r["q"]: r["est"] for r in quantile_estimates(spark, state, qs).collect()}
    batch_est = {
        r["q"]: r["est"]
        for r in quantile_estimates_of(histogram_increments(ev), qs).collect()
    }
    assert est == batch_est, f"stream {est} != batch {batch_est}"
    exact = {
        q: v
        for q, v in zip(
            qs,
            ev.where(F.col("value") > 0)
            .agg(F.percentile("value", F.array(*[F.lit(q) for q in qs])))
            .first()[0],
        )
    }
    bound = 2 ** (1.0 / (2 * LOG2_DIVS)) - 1  # ~4.4% relative
    worst = max(abs(est[q] - exact[q]) / exact[q] for q in qs)
    # same slack as the unit test: F.percentile interpolates between
    # order statistics, which can land the exact value one bucket off
    assert worst <= bound + 0.02, (
        f"worst rel err {worst:.4f} > bound {bound:.4f} (+0.02 slack)"
    )
    return (
        f"cell-parity + p50/p90/p99 within {worst:.1%} of exact "
        f"(bound {bound:.1%})"
    )


def _ivf_ingest_smoke(spark) -> str:
    """Incremental IVF index maintenance on the real cluster (r11):
    the embeddings table is replayed as a 3-file stream through the
    foreachBatch assignment against frozen stride centroids across
    separate executor JVMs; the maintained (cent_id, src_batch)-
    partitioned inverted-list state must be row-identical to the
    one-shot batch build (assignment is a pure per-vector function),
    and ANN probes served from the maintained state must equal probes
    over the one-shot state."""
    from real_time_data_pipeline_spark.operators.similarity import (
        stride_centroids,
    )
    from real_time_data_pipeline_spark.sources.tables import load_table
    from real_time_data_pipeline_spark.streaming.ivf_ingest import (
        ivf_ingest_sink,
        ivf_probe_state,
        ivf_state_build,
        merge_ivf_batch,
        read_ivf_state,
    )
    from real_time_data_pipeline_spark.streaming.sources import file_stream

    from pyspark.sql import functions as F

    work = tempfile.mkdtemp(prefix="rtdp-smoke-ivf-")
    replay, state, ck = f"{work}/replay", f"{work}/state", f"{work}/ck"
    os.makedirs(replay)
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    cents = stride_centroids(emb, "vec_id", "embedding").localCheckpoint()
    for i in range(3):
        emb.where(F.pmod("vec_id", F.lit(3)) == i).coalesce(1).write.parquet(
            os.path.join(replay, f"b{i}.parquet")
        )
    stream = file_stream(spark, f"{replay}/*", emb.schema, max_files_per_trigger=1)
    q = ivf_ingest_sink(stream, state, ck, cents)
    q.processAllAvailable()
    q.stop()

    def rows(df):
        return {
            (r.cent_id, r.nid, r.lo, r.scale, tuple(r.q))
            for r in df.collect()
        }

    got = rows(read_ivf_state(spark, state))
    want = rows(ivf_state_build(emb, cents))
    assert got == want and len(got) > 0, "inverted lists != batch build"
    one_shot = f"{work}/oneshot"
    merge_ivf_batch(emb, one_shot, 0, cents)
    queries = emb.where(F.col("vec_id") < 5)
    got_p = {
        tuple(r)
        for r in ivf_probe_state(spark, state, queries, cents, k=3).collect()
    }
    want_p = {
        tuple(r)
        for r in ivf_probe_state(spark, one_shot, queries, cents, k=3).collect()
    }
    assert got_p == want_p and len(got_p) > 0, "probe mismatch"
    n_lists = read_ivf_state(spark, state).select("cent_id").distinct().count()
    return (
        f"list-parity ({len(got)} vectors, {n_lists} lists) + "
        f"probe-parity ({len(got_p)} result rows)"
    )


def _ivf_compaction_loss_smoke(spark, live_workers, respawn) -> str:
    """Twin-state compaction under executor loss (VERDICT r11 #7):
    the one partitioned-twin failure mode only single-JVM pytest
    exercised before r12, run on the real cluster in two halves.

    Half 1 — worker killed WHILE `compact_partitioned_state` writes
    its staged `__tmp__` table. Two legitimate outcomes, both
    asserted: the write's tasks re-schedule onto the survivor and the
    compaction COMPLETES; or the retries race onto the dying executor
    before deregistration and the job ABORTS — the staged-rename
    contract's "crash mid-compaction" case, where the committed state
    must be bit-intact (the swap never exposes a partial table) and a
    RE-RUN compaction on the recovered cluster must succeed. Either
    way the rows and the reset guard (max src_batch via the sentinel)
    are asserted unchanged after every step; a hang or corruption
    fails the phase.

    Half 2 — the staged-rename crash window, DETERMINISTIC: a
    compaction that dies between its two renames leaves the committed
    table at ``__old__`` (simulated with exactly that rename); the
    next state entry point must restore it (sinks swap recovery) with
    rows and guard intact, and a NEXT live batch must still land.

    Frozen centroids are held as a driver-side frame (collect +
    recreate), NOT a localCheckpoint — this phase kills an executor,
    which would take localCheckpoint blocks with it.
    """
    import threading

    from pyspark.sql import functions as F

    from real_time_data_pipeline_spark.operators.similarity import (
        stride_centroids,
    )
    from real_time_data_pipeline_spark.sources.tables import load_table
    from real_time_data_pipeline_spark.streaming.ivf_ingest import (
        merge_ivf_batch,
        read_ivf_state,
    )
    from real_time_data_pipeline_spark.streaming.sinks import (
        committed_max_batch,
        compact_partitioned_state,
    )

    if not live_workers:
        raise RuntimeError(
            "no live worker process to kill — earlier phases lost or "
            "failed to respawn workers; cannot exercise executor loss"
        )
    work = tempfile.mkdtemp(prefix="rtdp-smoke-ivfcomp-")
    state = f"{work}/state"
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    cents_src = stride_centroids(emb, "vec_id", "embedding")
    cents = spark.createDataFrame(cents_src.collect(), cents_src.schema)
    chunks = [emb.where(F.pmod("vec_id", F.lit(3)) == i) for i in range(3)]
    for i, ch in enumerate(chunks):
        assert merge_ivf_batch(ch, state, i, cents) is True

    def rows():
        return {
            (r.cent_id, r.nid, r.lo, r.scale, tuple(r.q))
            for r in read_ivf_state(spark, state).collect()
        }

    want = rows()
    assert want, "empty pre-compaction state"

    outcome: dict = {}

    def _compact():
        try:
            # own job group: the phase deadline's group-cancel can
            # reach this nested thread's jobs too (groups are
            # thread-local; without this the jobs carry none)
            spark.sparkContext.setJobGroup(
                "smoke-ivf_compaction_executor_loss", "compact", True
            )
            compact_partitioned_state(spark, state)
        except BaseException as exc:  # noqa: BLE001 — reraised below
            outcome["error"] = exc

    t = threading.Thread(target=_compact, name="smoke-compact", daemon=True)
    t.start()
    time.sleep(0.2)  # let the staged write start before the kill
    before = _executor_addrs(spark)
    w = live_workers[0]
    respawn()  # standby takes the freed cores once the kill lands
    w.terminate()
    w.wait(timeout=30)
    t.join(timeout=180)
    assert not t.is_alive(), "compaction hung after executor loss"
    # Wait out the churn: confirmed loss of a pre-kill executor, then
    # a replacement registering on the freed cores (address SETS, not
    # counts — the artifact-loss phase's lesson).
    deadline = time.time() + 60
    while time.time() < deadline and not (before - _executor_addrs(spark)):
        time.sleep(1.0)
    lost = bool(before - _executor_addrs(spark))
    deadline = time.time() + 90
    while time.time() < deadline and not (_executor_addrs(spark) - before):
        time.sleep(1.0)
    if "error" in outcome:
        # The kill aborted the staged write — the crash case. The
        # committed state must be untouched (the swap exposes old or
        # new, never partial) and compaction must succeed on re-run.
        assert rows() == want, "aborted compaction corrupted the state"
        assert committed_max_batch(spark, state) == 2, "reset guard lost"
        compact_partitioned_state(spark, state)
        first = "aborted mid-write, state intact, re-run compacted"
    else:
        first = "completed on the surviving executor"
    assert rows() == want, "compaction corrupted rows under executor loss"
    assert committed_max_batch(spark, state) == 2, "reset guard lost"

    # half 2: crash-between-renames window, then recovery on next read
    os.rename(state, state + "__old__")
    assert rows() == want, "swap recovery did not restore the state"
    assert committed_max_batch(spark, state) == 2
    assert merge_ivf_batch(chunks[0].limit(0), state, 5, cents) is True

    deadline = time.time() + 90
    while time.time() < deadline and _count_executors(spark) < 2:
        time.sleep(1.0)
    return (
        f"compaction under worker kill: {first} (executor loss "
        f"{'confirmed' if lost else 'raced past the write'}; "
        f"{len(want)} rows, guard intact) + staged-rename recovery"
    )


def _corpusstats_ingest_smoke(spark) -> str:
    """Incremental corpus term-statistics maintenance on the real
    cluster (r11, tenth twin): the documents table is replayed as a
    3-file stream through the foreachBatch additive-delta commit
    across separate executor JVMs; the summed per-term (df, tf) and
    corpus scalars must be cell-identical to the one-shot batch
    build, and the BM25 ranking served from the maintained
    statistics must equal the oracle-checked `text_bm25_ranking`
    registry query row-for-row."""
    from pyspark.sql import functions as F

    from real_time_data_pipeline_spark.queries import REGISTRY
    from real_time_data_pipeline_spark.queries.text import BM25_QUERY_TERMS
    from real_time_data_pipeline_spark.sources.tables import load_table
    from real_time_data_pipeline_spark.streaming.corpusstats_ingest import (
        bm25_probe_state,
        corpus_stats_build,
        corpus_stats_ingest_sink,
        hybrid_rrf_probe_state,
        read_corpus_scalars,
        read_term_stats,
    )
    from real_time_data_pipeline_spark.streaming.sources import file_stream

    work = tempfile.mkdtemp(prefix="rtdp-smoke-cstats-")
    replay, state, ck = f"{work}/replay", f"{work}/state", f"{work}/ck"
    os.makedirs(replay)
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    for i in range(3):
        docs.where(F.pmod("doc_id", F.lit(3)) == i).coalesce(1).write.parquet(
            os.path.join(replay, f"b{i}.parquet")
        )
    stream = file_stream(spark, f"{replay}/*", docs.schema, max_files_per_trigger=1)
    q = corpus_stats_ingest_sink(stream, state, ck)
    q.processAllAvailable()
    q.stop()

    one = corpus_stats_build(docs)
    want_terms = {
        (r.term, r.df, r.tf)
        for r in one.where(F.col("term").isNotNull()).collect()
    }
    got_terms = {
        (r.term, r.df, r.tf) for r in read_term_stats(spark, state).collect()
    }
    assert got_terms == want_terms and len(got_terms) > 0, "term stats != batch"
    w = one.where(F.col("term").isNull()).collect()[0]
    s = read_corpus_scalars(spark, state).collect()[0]
    assert (s.n_docs, s.n_tokens) == (w.df, w.tf), "corpus scalars != batch"
    want_bm = [
        tuple(r) for r in REGISTRY["text_bm25_ranking"].fn(spark, SF_DIR).collect()
    ]
    got_bm = [
        tuple(r)
        for r in bm25_probe_state(
            spark, state, docs, BM25_QUERY_TERMS
        ).collect()
    ]
    assert got_bm == want_bm and len(got_bm) > 0, "BM25 probe != registry query"
    # hybrid RRF from the maintained lexical statistics (r12): the
    # shared fusion must reproduce the registry query row-for-row
    emb = load_table(spark, SF_DIR, "embeddings")
    want_h = [
        tuple(r)
        for r in REGISTRY["retrieval_hybrid_rrf"].fn(spark, SF_DIR).collect()
    ]
    got_h = [
        tuple(r)
        for r in hybrid_rrf_probe_state(
            spark, state, docs, emb, BM25_QUERY_TERMS
        ).collect()
    ]
    assert got_h == want_h and len(got_h) > 0, "hybrid probe != registry query"
    return (
        f"stats-parity ({len(got_terms)} terms, {s.n_docs} docs) + "
        f"BM25 probe == registry ranking ({len(got_bm)} rows) + "
        f"hybrid-RRF probe == registry fusion ({len(got_h)} rows)"
    )


def _graph_ingest_smoke(spark) -> str:
    """Incremental trade-flow edge-list maintenance on the real
    cluster (r15, eleventh twin): lineitem is replayed as a 3-file
    stream through the foreachBatch additive-cents commit across
    separate executor JVMs; the summed edge list must be
    cell-identical to the one-shot batch build, and PageRank served
    from the maintained state must equal the same program over the
    one-shot edge list row-for-row."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from real_time_data_pipeline_spark.queries.graph import _pagerank_ranks
    from real_time_data_pipeline_spark.sources.tables import load_table
    from real_time_data_pipeline_spark.streaming.graph_ingest import (
        read_trade_flows,
        trade_flow_ingest_sink,
        trade_flows_build,
    )
    from real_time_data_pipeline_spark.streaming.sources import file_stream

    work = tempfile.mkdtemp(prefix="rtdp-smoke-graph-")
    replay, state, ck = f"{work}/replay", f"{work}/state", f"{work}/ck"
    os.makedirs(replay)
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, SF_DIR, "orders")
    cust = load_table(spark, SF_DIR, "customer")
    supp = load_table(spark, SF_DIR, "supplier")
    nation = load_table(spark, SF_DIR, "nation")
    for i in range(3):
        li.where(F.pmod("l_orderkey", F.lit(3)) == i).coalesce(1).write.parquet(
            os.path.join(replay, f"b{i}.parquet")
        )
    stream = file_stream(
        spark, f"{replay}/*", li.schema, max_files_per_trigger=1
    )
    q = trade_flow_ingest_sink(stream, orders, cust, supp, nation, state, ck)
    q.processAllAvailable()
    q.stop()

    one = trade_flows_build(li, orders, cust, supp, nation)
    want = {(r.src, r.dst, r.w_cents) for r in one.collect()}
    got = {
        (r.src, r.dst, r.w_cents)
        for r in read_trade_flows(spark, state).collect()
    }
    assert got == want and len(got) > 0, "edge list != batch build"

    def ranks(flows):
        edges = flows.withColumn(
            "p",
            F.col("w_cents")
            / F.sum("w_cents").over(Window.partitionBy("src")),
        ).select("src", "dst", "p")
        return sorted(tuple(r) for r in _pagerank_ranks(edges).collect())

    got_pr = ranks(read_trade_flows(spark, state))
    want_pr = ranks(one.select("src", "dst", "w_cents"))
    assert got_pr == want_pr and len(got_pr) > 0, "pagerank from state != one-shot"
    return f"edge parity ({len(got)} edges) + pagerank parity ({len(got_pr)} nations)"


def _hybrid_ivf_smoke(spark) -> str:
    """Fully-maintained hybrid retrieval on the real cluster (r13,
    VERDICT r12 #5): lexical ranks served from the corpus-stats state,
    dense ranks from the IVF twin's partition-pruned quantized probe —
    the production shape where NEITHER retriever rescans its corpus —
    with both states maintained incrementally across separate executor
    JVMs. The variant is recall-contracted, not row-pinned (IVF
    quantization trades rank-exactness for footprint by design):
    overlap@20 against the oracle-checked registry fusion must clear
    the 0.75 floor (measured 0.85-0.90 in the single-JVM suite), and
    every doc the two variants share must carry the IDENTICAL
    lex_rank — the lexical side is exact, so any drift there is a
    state-maintenance bug, not quantization."""
    from pyspark.sql import functions as F

    from real_time_data_pipeline_spark.operators.similarity import (
        stride_centroids,
    )
    from real_time_data_pipeline_spark.queries import REGISTRY
    from real_time_data_pipeline_spark.queries.text import (
        BM25_QUERY_TERMS,
        RRF_QUERY_VEC_ID,
    )
    from real_time_data_pipeline_spark.sources.tables import load_table
    from real_time_data_pipeline_spark.streaming.corpusstats_ingest import (
        hybrid_rrf_probe_ivf,
        merge_corpus_stats_batch,
    )
    from real_time_data_pipeline_spark.streaming.ivf_ingest import (
        merge_ivf_batch,
    )

    work = tempfile.mkdtemp(prefix="rtdp-smoke-hybrid-")
    cs, ivf = f"{work}/cs", f"{work}/ivf"
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    emb = load_table(spark, SF_DIR, "embeddings")
    for i in range(2):
        assert (
            merge_corpus_stats_batch(
                docs.where(F.pmod("doc_id", F.lit(2)) == i), cs, i
            )
            is True
        )
    cents = stride_centroids(emb, "vec_id", "embedding").localCheckpoint()
    for i in range(2):
        assert (
            merge_ivf_batch(
                emb.where(F.pmod("vec_id", F.lit(2)) == i), ivf, i, cents
            )
            is True
        )
    qdf = emb.where(F.col("vec_id") == RRF_QUERY_VEC_ID)
    got = {
        r.doc_id: r.lex_rank
        for r in hybrid_rrf_probe_ivf(
            spark, cs, ivf, docs, qdf, cents, BM25_QUERY_TERMS, nprobe=3
        ).collect()
    }
    want = {
        r.doc_id: r.lex_rank
        for r in REGISTRY["retrieval_hybrid_rrf"].fn(spark, SF_DIR).collect()
    }
    assert len(got) == 20 and len(want) == 20, "fusion lists not depth-20"
    shared = set(got) & set(want)
    overlap = len(shared) / 20
    assert overlap >= 0.75, f"overlap@20 {overlap} below the 0.75 floor"
    drift = [d for d in shared if got[d] != want[d]]
    assert not drift, f"lex_rank drifted for docs {drift}"
    return (
        f"maintained-hybrid overlap@20={overlap:.2f} (floor 0.75); "
        f"{len(shared)} shared docs lex_rank-identical"
    )


def _ivfpq_ingest_smoke(spark) -> str:
    """Incremental IVF-PQ index maintenance on the real cluster
    (r11): the embeddings replay through the frozen-centroid coarse
    assignment AND frozen-codebook PQ encoding across separate
    executor JVMs; the maintained code state must be row-identical to
    the one-shot build, and composed IVF+ADC probes from maintained
    and one-shot state must be equal."""
    from real_time_data_pipeline_spark.operators.similarity import (
        pq_codebooks,
        stride_centroids,
    )
    from real_time_data_pipeline_spark.sources.tables import load_table
    from real_time_data_pipeline_spark.streaming.ivfpq_ingest import (
        ivfpq_ingest_sink,
        ivfpq_probe_state,
        ivfpq_state_build,
        merge_ivfpq_batch,
        read_ivfpq_state,
    )
    from real_time_data_pipeline_spark.streaming.sources import file_stream

    from pyspark.sql import functions as F

    work = tempfile.mkdtemp(prefix="rtdp-smoke-ivfpq-")
    replay, state, ck = f"{work}/replay", f"{work}/state", f"{work}/ck"
    os.makedirs(replay)
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    cents = stride_centroids(emb, "vec_id", "embedding").localCheckpoint()
    books = pq_codebooks(emb, "vec_id", "embedding").localCheckpoint()
    for i in range(3):
        emb.where(F.pmod("vec_id", F.lit(3)) == i).coalesce(1).write.parquet(
            os.path.join(replay, f"b{i}.parquet")
        )
    stream = file_stream(spark, f"{replay}/*", emb.schema, max_files_per_trigger=1)
    q = ivfpq_ingest_sink(stream, state, ck, cents, books)
    q.processAllAvailable()
    q.stop()

    def rows(df):
        return {(r.cent_id, r.nid, tuple(r.codes)) for r in df.collect()}

    got = rows(read_ivfpq_state(spark, state))
    want = rows(ivfpq_state_build(emb, cents, books))
    assert got == want and len(got) > 0, "code state != batch build"
    one_shot = f"{work}/oneshot"
    merge_ivfpq_batch(emb, one_shot, 0, cents, books)
    queries = emb.where(F.col("vec_id") < 5)
    got_p = {
        tuple(r)
        for r in ivfpq_probe_state(
            spark, state, queries, cents, books, k=3
        ).collect()
    }
    want_p = {
        tuple(r)
        for r in ivfpq_probe_state(
            spark, one_shot, queries, cents, books, k=3
        ).collect()
    }
    assert got_p == want_p and len(got_p) > 0, "ADC probe mismatch"
    return (
        f"code-parity ({len(got)} vectors x 4 codes) + "
        f"ADC probe-parity ({len(got_p)} result rows)"
    )


def _zonemap_ingest_smoke(spark) -> str:
    """Incremental zone-map maintenance on the real cluster (r10): the
    events table is replayed as a 3-file stream through the composite
    merge (SUM counts behind the exactly-once marker, lattice min/max,
    set-union user pairs — the pair upsert committing BEFORE the
    marker-protected stats swap) across separate executor JVMs; the
    derived manifest must reproduce the `data_partition_zonemap`
    registry query's DuckDB-checked frame row for row."""
    from real_time_data_pipeline_spark.queries import REGISTRY
    from real_time_data_pipeline_spark.sources.tables import load_table
    from real_time_data_pipeline_spark.streaming.sources import file_stream
    from real_time_data_pipeline_spark.streaming.zonemap_ingest import (
        read_zonemap,
        zonemap_ingest_sink,
    )
    from tests.oracle import assert_matches

    from pyspark.sql import functions as F

    work = tempfile.mkdtemp(prefix="rtdp-smoke-zm-")
    replay, stats, users, ck = (
        f"{work}/replay", f"{work}/stats", f"{work}/users", f"{work}/ck"
    )
    os.makedirs(replay)
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    for i in range(3):
        ev.where(F.pmod("event_id", F.lit(3)) == i).coalesce(1).write.parquet(
            os.path.join(replay, f"b{i}.parquet")
        )
    stream = file_stream(spark, f"{replay}/*", ev.schema, max_files_per_trigger=1)
    q = zonemap_ingest_sink(stream, stats, users, ck)
    q.processAllAvailable()
    q.stop()
    derived = read_zonemap(spark, stats, users)
    spec = REGISTRY["data_partition_zonemap"]
    assert_matches(derived, spec.oracle, SF_DIR)
    n = derived.count()
    return f"manifest from maintained state oracle-match ({n} partitions)"


def _count_executors(spark) -> int:
    return len(spark._jsc.sc().statusTracker().getExecutorInfos()) - 1


def _executor_addrs(spark) -> set:
    """Block-manager host:port of every registered executor (plus the
    driver, whose entry is constant across the phase)."""
    return {
        f"{e.host()}:{e.port()}"
        for e in spark._jsc.sc().statusTracker().getExecutorInfos()
    }


def _artifact_loss_smoke(spark, workers: list, respawn) -> str:
    """Executor-loss recovery of session-shared artifacts (VERDICT r9
    #4): build a shared artifact (localCheckpoint blocks — this phase
    runs BEFORE the session gets a reliable checkpoint dir, exactly
    the deployment `clear_shared_artifacts` exists for), kill one
    worker so its executor's blocks die, show a consumer of the
    memoized artifact fails, then clear_shared_artifacts() → rerun →
    the rebuild is oracle-checked green. Ends by respawning a worker
    so later phases keep two executors.
    """
    from real_time_data_pipeline_spark.queries import REGISTRY
    from real_time_data_pipeline_spark.queries.artifacts import (
        clear_shared_artifacts,
    )
    from tests.oracle import assert_matches

    spec = REGISTRY["graph_pagerank_trade"]
    assert_matches(spec.fn(spark, SF_DIR), spec.oracle, SF_DIR)  # builds artifact
    # Kill BOTH original workers (respawning a fresh one in between so
    # the cluster always has capacity): the artifact's localCheckpoint
    # blocks live on one of the two original executors — a single kill
    # can miss it — but after both die the blocks are gone for
    # certain, and the memoized frame's truncated lineage cannot
    # recompute them.
    consumer_failed_after = 0
    for i, w in enumerate(workers, 1):
        # spark.cores.max is fully allocated by the two original
        # workers, so the standby spawned here gets an executor only
        # AFTER the kill frees cores — track executor ADDRESS SETS,
        # not counts: first confirm the kill actually removed one of
        # the pre-kill executors, then confirm a replacement (an
        # address not seen before the kill) registered on the freed
        # cores, so the probe runs after a CONFIRMED loss and the
        # post-clear rebuild has two executors.
        before = _executor_addrs(spark)
        respawn()
        w.terminate()  # SIGTERM: worker shuts its executor down with it
        w.wait(timeout=30)
        deadline = time.time() + 60
        while time.time() < deadline and not (before - _executor_addrs(spark)):
            time.sleep(1.0)
        deadline = time.time() + 90
        while time.time() < deadline and not (_executor_addrs(spark) - before):
            time.sleep(1.0)
        try:
            spec.fn(spark, SF_DIR).count()
        except Exception:
            consumer_failed_after = i
            break
    clear_shared_artifacts()
    assert_matches(spec.fn(spark, SF_DIR), spec.oracle, SF_DIR)  # rebuild
    deadline = time.time() + 90
    while time.time() < deadline and _count_executors(spark) < 2:
        time.sleep(1.0)
    return (
        "post-loss rebuild oracle-match ("
        + (
            f"consumer failed after losing executor {consumer_failed_after} "
            "as expected"
            if consumer_failed_after
            else "consumer UNEXPECTEDLY survived both losses"
        )
        + ")"
    )


def main() -> int:
    procs: list[subprocess.Popen] = []
    master_url = f"spark://127.0.0.1:{MASTER_PORT}"
    try:
        procs.append(
            _spawn(
                "org.apache.spark.deploy.master.Master",
                "-h", "127.0.0.1", "-p", str(MASTER_PORT),
                "--webui-port", "0",
            )
        )
        _wait_port(MASTER_PORT)
        for _ in range(2):
            procs.append(
                _spawn(
                    "org.apache.spark.deploy.worker.Worker", master_url,
                    "-c", "4", "-m", "4g", "--webui-port", "0",
                )
            )
        from real_time_data_pipeline_spark.session import get_spark

        ckpt = tempfile.mkdtemp(prefix="rtdp-smoke-ckpt-")
        spark = get_spark(
            app_name="rtdp-cluster-smoke",
            master=master_url,
            shuffle_partitions=8,
            extra_conf={
                "spark.executor.memory": "3g",
                "spark.cores.max": "8",
                "spark.executorEnv.PYTHONPATH": REPO,
            },
        )
        spark.sparkContext.setLogLevel("ERROR")
        # NOTE: the checkpoint dir is set AFTER the artifact-loss
        # phase below — that phase must run on localCheckpoint blocks.
        # prove we really are on separate executor JVMs (registration
        # is async: workers connect, then executors launch and phone home)
        deadline = time.time() + 90
        n_exec = 0
        while time.time() < deadline:
            n_exec = (
                len(spark._jsc.sc().statusTracker().getExecutorInfos()) - 1
            )  # minus driver
            if n_exec >= 2:
                break
            time.sleep(1.0)
        print(f"executors (excl. driver): {n_exec}", flush=True)
        if n_exec < 2:
            print("FAIL: expected >=2 remote executors", flush=True)
            return 2

        failures = 0
        # Artifact executor-loss phase FIRST: it needs the session
        # WITHOUT a reliable checkpoint dir (localCheckpoint blocks are
        # what die with an executor). The checkpoint dir is set right
        # after for every remaining phase.
        t0 = time.perf_counter()

        def _respawn_worker():
            procs.append(
                _spawn(
                    "org.apache.spark.deploy.worker.Worker", master_url,
                    "-c", "4", "-m", "4g", "--webui-port", "0",
                )
            )

        try:
            status = _run_phase(
                spark,
                "artifact_executor_loss",
                lambda: _artifact_loss_smoke(spark, procs[1:3], _respawn_worker),
                timeout_s=420,
            )
            print(
                f"  artifact_executor_loss: {status} "
                f"({time.perf_counter() - t0:.1f}s)",
                flush=True,
            )
        except Exception as exc:  # noqa: BLE001 — report, then fail
            failures += 1
            print(
                f"  artifact_executor_loss: FAIL {str(exc).splitlines()[0][:200]}{_taint_note()}",
                flush=True,
            )
        spark.sparkContext.setCheckpointDir(ckpt)  # shared FS on one box

        from real_time_data_pipeline_spark.queries import REGISTRY
        from real_time_data_pipeline_spark.operators.ranking import (
            release_rank_caches,
        )
        from tests.oracle import assert_matches

        names = os.environ.get("SPARK_GRAFT_SMOKE_QUERIES")
        names = names.split(",") if names else DEFAULT_QUERIES
        for name in names:
            spec = REGISTRY[name]
            t0 = time.perf_counter()
            try:
                df = spec.fn(spark, SF_DIR)
                if spec.oracle is not None:
                    assert_matches(df, spec.oracle, SF_DIR)
                    status = "oracle-match"
                else:
                    assert df.count() >= 0
                    status = "rows-only"
                print(
                    f"  {name}: {status} ({time.perf_counter() - t0:.1f}s)",
                    flush=True,
                )
            except Exception as exc:  # noqa: BLE001 — report all, then fail
                failures += 1
                print(
                    f"  {name}: FAIL {str(exc).splitlines()[0][:200]}{_taint_note()}",
                    flush=True,
                )
            finally:
                release_rank_caches()
        # Streaming-twin phases, each under the same hard deadline
        # (recorded healthy runs finish in 8-15 s; the 240 s budget is
        # pure hang insurance, not a perf bound).
        phases = [
            ("streaming_gold_15m", _streaming_smoke),
            ("retention_ingest", _retention_ingest_smoke),
            ("countmin_ingest", _countmin_ingest_smoke),
            ("hll_ingest", _hll_ingest_smoke),
            ("zonemap_ingest", _zonemap_ingest_smoke),
            ("histogram_ingest", _histogram_ingest_smoke),
            ("ivf_ingest", _ivf_ingest_smoke),
            ("ivfpq_ingest", _ivfpq_ingest_smoke),
            ("corpusstats_ingest", _corpusstats_ingest_smoke),
            ("graph_ingest", _graph_ingest_smoke),
            ("hybrid_rrf_ivf", _hybrid_ivf_smoke),
        ]
        for label, phase_fn in phases:
            t0 = time.perf_counter()
            try:
                status = _run_phase(
                    spark, label, lambda f=phase_fn: f(spark), timeout_s=240
                )
                print(
                    f"  {label}: {status} "
                    f"({time.perf_counter() - t0:.1f}s)",
                    flush=True,
                )
            except Exception as exc:  # noqa: BLE001 — report, then fail
                failures += 1
                print(
                    f"  {label}: FAIL {str(exc).splitlines()[0][:200]}{_taint_note()}",
                    flush=True,
                )
        # Compaction-under-executor-loss LAST (it kills a worker;
        # running it after the twin phases keeps their results clean
        # even if re-registration is slow).
        t0 = time.perf_counter()
        try:
            live = [p for p in procs[1:] if p.poll() is None]
            status = _run_phase(
                spark,
                "ivf_compaction_executor_loss",
                lambda: _ivf_compaction_loss_smoke(spark, live, _respawn_worker),
                timeout_s=420,
            )
            print(
                f"  ivf_compaction_executor_loss: {status} "
                f"({time.perf_counter() - t0:.1f}s)",
                flush=True,
            )
        except Exception as exc:  # noqa: BLE001 — report, then fail
            failures += 1
            print(
                "  ivf_compaction_executor_loss: FAIL "
                f"{str(exc).splitlines()[0][:200]}{_taint_note()}",
                flush=True,
            )
        spark.stop()
        print(("OK" if failures == 0 else f"FAILURES: {failures}"), flush=True)
        return 1 if failures else 0
    finally:
        for p in procs:
            p.terminate()
        for p in procs:
            try:
                p.wait(timeout=10)
            except subprocess.TimeoutExpired:
                p.kill()


if __name__ == "__main__":
    sys.exit(main())
