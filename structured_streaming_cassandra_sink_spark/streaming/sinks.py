"""Streaming sinks — foreachBatch adapters with pluggable backends.

The reference implements a per-row ForeachWriter that opens a Cassandra
session and issues one synchronous CQL INSERT per row
(cassandra_sink.scala:14-41) — its central scalability defect (SURVEY.md
§4.1) and unavailable in PySpark anyway. The idiomatic replacement is
``foreachBatch``: each micro-batch is a normal DataFrame written through
the batch writer — connector-pooled, partition-parallel, one round-trip
per partition-batch instead of per row, and epoch-tagged for replay
idempotence.

Backends:
- ``parquet_upsert_sink`` — local twin with the SAME upsert-by-key end
  state as the reference's Cassandra PK table (:71-79): MERGE emulated as
  read-existing + union + latest-per-key + atomic swap.
- ``parquet_append_sink`` — plain append (for append-semantics queries).
- ``cassandra_upsert_sink`` — production path via the Spark Cassandra
  Connector (DataSourceV2); Cassandra writes are natively upserts, so the
  batch `.save()` IS the merge. Gated: the connector jar isn't in this
  environment.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame


def parquet_append_sink(path: str):
    """Plain append — NOT replay-safe: a re-delivered epoch appends its
    rows twice. Use only behind an idempotent downstream (dedup) or use
    :func:`parquet_epoch_append_sink`."""

    def write(df: DataFrame, epoch_id: int) -> None:
        df.write.mode("append").parquet(path)

    return write


def parquet_epoch_append_sink(path: str):
    """Replay-idempotent append: each epoch writes to its own partition
    directory (``epoch=<id>``) in OVERWRITE mode, so a re-delivered epoch
    after checkpoint-restart rewrites the same directory instead of
    duplicating rows — epoch-id tagging as the exactly-once mechanism
    (SURVEY.md §4.3). Readers see one dataset via partition discovery;
    at 100 TB this is the transaction-log pattern (Delta/Iceberg commit
    by epoch) in plain-parquet form."""

    def write(df: DataFrame, epoch_id: int) -> None:
        df.write.mode("overwrite").parquet(f"{path}/epoch={epoch_id}")

    return write


def _upsert_state_complete(d: str) -> bool:
    """A state dir is adoptable only when Spark finished writing it
    (the _SUCCESS job marker) — a crash mid-write leaves no marker."""
    return os.path.isdir(d) and os.path.isfile(os.path.join(d, "_SUCCESS"))


def _recover_upsert_dir(path: str) -> None:
    """Repair any crash window of the rename-swap below (idempotent;
    safe to re-crash at any point in here too).

    Invariant: a COMPLETE ``__next`` always supersedes ``path`` — it is
    exactly (old state ⊎ some epoch's batch), and re-merging a replayed
    epoch into it converges to the same rows (latest-per-key is
    idempotent). An INCOMPLETE ``__next`` is discarded; ``__old`` is a
    superseded state and always discarded."""
    nxt, old = path + "__next", path + "__old"
    if _upsert_state_complete(nxt):
        if os.path.isdir(old):
            shutil.rmtree(old)
        if os.path.isdir(path):
            os.rename(path, old)
        os.rename(nxt, path)
    if os.path.isdir(old):
        shutil.rmtree(old)
    if os.path.isdir(nxt):  # incomplete leftover write
        shutil.rmtree(nxt)


def parquet_upsert_sink(path: str, key: str, order: list[str]):
    """Upsert-by-key into a parquet dir: the reference sink's end-state
    semantics, locally testable and restart-idempotent (re-running an
    epoch converges to the same state — same guarantee the reference gets
    from Cassandra PK upserts on replay, :19-23).

    Crash safety: the merged state is written ONCE to ``path__next``
    (the lazy read of the current state is safe — ``path`` is untouched
    until that write completes), then swapped in by renames:
    current → ``__old``, ``__next`` → current, delete ``__old``. Every
    crash window leaves either the old state, or a complete ``__next``
    that :func:`_recover_upsert_dir` adopts on the next epoch — the
    accumulated table is never the casualty (the round-1 rmtree-then-
    rename swap could drop ALL prior state if the process died between
    the two calls).

    Scale note: at 100 TB this becomes Delta/Iceberg MERGE INTO or the
    Cassandra connector below — the read-union-rewrite here is the
    jar-free local twin, not the production plan."""
    from ..plans.flagship import latest_per_key

    def write(df: DataFrame, epoch_id: int) -> None:
        spark = df.sparkSession
        _recover_upsert_dir(path)
        batch = latest_per_key(df, key, order)
        if os.path.isdir(path):
            existing = spark.read.parquet(path)
            merged = latest_per_key(
                existing.unionByName(batch.select(*existing.columns)), key, order
            )
        else:
            merged = batch
        nxt, old = path + "__next", path + "__old"
        merged.write.mode("overwrite").parquet(nxt)
        if os.path.isdir(path):
            os.rename(path, old)
        os.rename(nxt, path)
        shutil.rmtree(old, ignore_errors=True)

    return write


def cassandra_upsert_sink(keyspace: str, table: str):
    """Production sink: batch write per epoch through the Spark Cassandra
    Connector. Replaces the reference's per-row ForeachWriter INSERTs
    (cassandra_sink.scala:30-34) with connector-batched, token-aware
    writes; Cassandra PK upsert gives the same latest-per-key semantics.

    Requires `com.datastax.spark:spark-cassandra-connector` on the
    classpath and `spark.cassandra.connection.host` set (ref :49).
    """

    def write(df: DataFrame, epoch_id: int) -> None:
        (
            df.write.format("org.apache.spark.sql.cassandra")
            .options(keyspace=keyspace, table=table)
            .mode("append")
            .save()
        )

    return write


def start_to_sink(
    transformed: DataFrame,
    sink_fn,
    checkpoint_dir: str,
    query_name: str = "KafkaToSinkForeachBatch",
    output_mode: str = "update",
    available_now: bool = False,
):
    """writeStream wiring shared by all sinks — mirrors the reference's
    lifecycle (queryName/outputMode/start, cassandra_sink.scala:122-127)
    with per-query checkpointing (modern form of the global conf at :50).

    ``available_now=True`` runs in catch-up mode (Trigger.AvailableNow):
    process everything currently available in rate-limited micro-batches,
    then STOP — the backfill/cron form of the same pipeline, sharing the
    checkpoint with the continuous form."""
    writer = (
        transformed.writeStream.queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(sink_fn)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# Manifest-log MERGE sink — the transaction-log commit protocol
# (Delta/Iceberg idiom) in dependency-free form.
# ---------------------------------------------------------------------------
def _manifest_log_dir(path: str) -> str:
    return os.path.join(path, "_log")


def _manifest_latest(path: str) -> dict | None:
    """Highest committed manifest, or None. Only ``<int>.json`` names are
    commits — tmp files from a crashed commit are invisible here."""
    import json

    log = _manifest_log_dir(path)
    if not os.path.isdir(log):
        return None
    versions = [
        int(f[: -len(".json")])
        for f in os.listdir(log)
        if f.endswith(".json") and f[: -len(".json")].isdigit()
    ]
    if not versions:
        return None
    with open(os.path.join(log, f"{max(versions)}.json")) as fh:
        return json.load(fh)


def manifest_versions(path: str) -> list[int]:
    """All committed version numbers, ascending. Only ``<int>.json``
    log entries count — tmp files from a crashed commit are invisible."""
    log = _manifest_log_dir(path)
    if not os.path.isdir(log):
        return []
    return sorted(
        int(f[: -len(".json")])
        for f in os.listdir(log)
        if f.endswith(".json") and f[: -len(".json")].isdigit()
    )


def read_manifest_table(spark, path: str, version: int | None = None):
    """Snapshot read: resolve a committed version from the log and read
    exactly its file set. ``version=None`` reads the CURRENT version;
    passing an older committed version is TIME TRAVEL — every version's
    data dir is immutable once its manifest commits (the sink writes
    ``data/v{N}`` fresh and never mutates a published one), so an old
    snapshot is byte-identical to what a reader saw at its commit
    instant. Uncommitted/orphaned data dirs are invisible either way —
    this is what makes the sink's crash window harmless."""
    import json

    if version is None:
        m = _manifest_latest(path)
        if m is None:
            raise FileNotFoundError(f"no committed manifest under {path}")
    else:
        f = os.path.join(_manifest_log_dir(path), f"{int(version)}.json")
        if not os.path.isfile(f):
            raise FileNotFoundError(
                f"version {version} not committed under {path}; "
                f"have {manifest_versions(path)}"
            )
        with open(f) as fh:
            m = json.load(fh)
    return spark.read.parquet(os.path.join(path, m["data_dir"]))


def manifest_merge_sink(path: str, key: str, order: list[str], retain: int | None = 2):
    """MERGE-by-key sink committed through a transaction log — the
    production idiom (Delta/Iceberg MERGE INTO) expressed with plain
    parquet + an atomic manifest rename, no library needed:

    1. resolve current version V from ``_log/`` (highest ``N.json``);
    2. replay guard: if V's manifest already records this epoch, the
       epoch was fully committed before a restart — skip (exactly-once);
    3. write the merged table to a fresh IMMUTABLE data dir
       ``data/v{V+1}-e{epoch}`` (never mutates the current version);
    4. COMMIT = write ``_log/.tmp-*`` then os.rename to
       ``_log/{V+1}.json`` — one atomic filesystem op is the only
       publish point;
    5. GC superseded data dirs, keeping the newest ``retain`` versions
       (default 2 = current + immediately-previous): an in-flight reader
       pinned to version V survives the commit of V+1 (its files outlive
       the scan). ``retain=None`` keeps every version — full time-travel
       history; any committed version stays readable via
       ``read_manifest_table(spark, path, version=N)``. 2 is the minimal
       retention that honors the concurrent-reader claim below; a
       production deployment sets this from its snapshot-isolation /
       time-travel policy (Delta's ``delta.deletedFileRetentionDuration``
       analog, expressed in versions).

    Every crash window is safe: die before the rename and readers still
    see version V (the orphan data dir is invisible and re-used by the
    replay); die after and the epoch is committed, so the replay hits
    the guard in step 2. Unlike ``parquet_upsert_sink`` the current
    state is NEVER renamed away — readers can run concurrently with a
    commit."""
    import json

    from ..plans.flagship import latest_per_key

    def write(df: DataFrame, epoch_id: int) -> None:
        spark = df.sparkSession
        m = _manifest_latest(path)
        if m is not None and int(m["epoch_id"]) == int(epoch_id):
            return  # replayed epoch already fully committed
        version = 0 if m is None else int(m["version"]) + 1
        batch = latest_per_key(df, key, order)
        if m is not None:
            existing = spark.read.parquet(os.path.join(path, m["data_dir"]))
            merged = latest_per_key(
                existing.unionByName(batch.select(*existing.columns)), key, order
            )
        else:
            merged = batch
        data_dir = os.path.join("data", f"v{version}-e{epoch_id}")
        merged.write.mode("overwrite").parquet(os.path.join(path, data_dir))
        log = _manifest_log_dir(path)
        os.makedirs(log, exist_ok=True)
        tmp = os.path.join(log, f".tmp-{version}-{epoch_id}.json")
        with open(tmp, "w") as fh:
            json.dump(
                {"version": version, "epoch_id": int(epoch_id), "data_dir": data_dir},
                fh,
            )
        os.rename(tmp, os.path.join(log, f"{version}.json"))  # the commit
        # GC: keep the newest `retain` versions' data dirs (and their
        # manifests — a log entry must never outlive its files). Keeping
        # at least v-1 means a reader that resolved the manifest just
        # before this commit can still finish scanning its pinned dir.
        if retain is None:
            return
        versions = manifest_versions(path)
        keep_versions = set(versions[-max(int(retain), 2):])
        keep_dirs = set()
        for v in keep_versions:
            with open(os.path.join(log, f"{v}.json")) as fh:
                keep_dirs.add(json.load(fh)["data_dir"])
        # manifests BEFORE data dirs: a log entry must never outlive its
        # files, so if we crash mid-GC the worst case is an orphan data
        # dir (invisible, harmless), never a manifest pointing at
        # deleted files.
        for v in versions:
            if v not in keep_versions:
                os.remove(os.path.join(log, f"{v}.json"))
        droot = os.path.join(path, "data")
        for d in os.listdir(droot):
            if os.path.join("data", d) not in keep_dirs:
                shutil.rmtree(os.path.join(droot, d), ignore_errors=True)

    return write
