"""Per-stage checkpointing with per-partition lineage manifests.

Every stage boundary can be materialized to parquet together with a manifest
recording (stage, config hash, model identity, row count, url range, and a
per-partition breakdown). Resume = if a manifest exists and its config hash
matches, the stage is NOT recomputed — the parquet is read back, giving exact
resumability (north rule: "resumable from checkpoint with per-partition
lineage + metrics").
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

MANIFEST = "_kg_manifest.json"


def _manifest_path(path: str) -> str:
    return os.path.join(path, MANIFEST)


def try_resume(
    spark: SparkSession,
    path: str,
    stage: str,
    config_hash: str,
    model_hash: str = "",
) -> DataFrame | None:
    """Resume only when stage, config hash AND model identity all match —
    a model/extractor version bump outside PipelineConfig must invalidate
    the checkpoint or 'exact resume' silently serves stale outputs."""
    mf = _manifest_path(path)
    if not os.path.exists(mf):
        return None
    with open(mf) as f:
        meta = json.load(f)
    if (meta.get("stage") != stage
            or meta.get("config_hash") != config_hash
            or meta.get("model_hash", "") != model_hash):
        return None
    return spark.read.parquet(path)


def hot_key_stats(df: DataFrame, key_col: str) -> dict:
    """Straggler guard metric: the per-key row-count maximum, its key, and
    the key count. A bot user with millions of events (the documented
    watch item on funnel/sessionize, whose per-user collected arrays are
    bounded only by per-user activity) — or a giant document fanning out
    into thousands of sentences — becomes OBSERVABLE in the lineage
    manifest before it becomes a straggling or OOMing task. One extra agg
    job per stage boundary; ties break to the lexicographically largest
    key so the metric is deterministic."""
    row = (df.groupBy(key_col).agg(F.count(F.lit(1)).alias("k_rows"))
           .agg(F.count(F.lit(1)).alias("n_keys"),
                F.max(F.struct(
                    F.col("k_rows"),
                    F.col(key_col).cast("string").alias("k"))).alias("top"))
           .collect()[0])
    if not row["n_keys"]:
        return {"col": key_col, "n_keys": 0, "max_rows": 0, "hot_key": None}
    return {"col": key_col, "n_keys": int(row["n_keys"]),
            "max_rows": int(row["top"]["k_rows"]),
            "hot_key": row["top"]["k"]}


def write_stage(
    df: DataFrame,
    path: str,
    stage: str,
    config_hash: str,
    model_hash: str = "",
    url_col: str | None = "url",
    hot_key_col: str | None = None,
) -> DataFrame:
    """Materialize a stage + manifest; returns the re-read DataFrame (so the
    downstream plan reads from disk, cutting lineage like the reference's
    stage boundaries). The manifest's metrics include ``hot_key`` — the
    per-key row-count max over ``hot_key_col`` (default: the url column),
    the skew/straggler early-warning signal."""
    spark = df.sparkSession
    t0 = time.time()
    df.write.mode("overwrite").parquet(path)
    elapsed = round(time.time() - t0, 3)
    out = spark.read.parquet(path)

    aggs = [F.count(F.lit(1)).alias("rows")]
    if url_col and url_col in out.columns:
        aggs += [F.min(url_col).alias("url_min"), F.max(url_col).alias("url_max")]
    per_part = (
        out.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid").agg(*aggs)
        .orderBy("_pid")
        .collect()
    )
    total = sum(r["rows"] for r in per_part)
    meta = {
        "stage": stage,
        "config_hash": config_hash,
        "model_hash": model_hash,
        "rows": total,
        "created_unix": int(time.time()),
        "metrics": {
            "write_seconds": elapsed,
            "rows_per_sec": round(total / elapsed, 2) if elapsed else None,
            "n_partitions": len(per_part),
        },
        "partitions": [r.asDict() for r in per_part],
    }
    key_col = hot_key_col or url_col
    if key_col and key_col in out.columns:
        meta["metrics"]["hot_key"] = hot_key_stats(out, key_col)
    with open(_manifest_path(path), "w") as f:
        json.dump(meta, f, indent=1, default=str)
    return out


def checkpointed(
    df_fn,
    spark: SparkSession,
    workdir: str | None,
    stage: str,
    config_hash: str,
    model_hash: str = "",
) -> DataFrame:
    """Run ``df_fn()`` with checkpoint-or-resume semantics. With no workdir,
    just build the lazy plan (no materialization)."""
    if workdir is None:
        return df_fn()
    path = os.path.join(workdir, stage)
    resumed = try_resume(spark, path, stage, config_hash, model_hash)
    if resumed is not None:
        return resumed
    return write_stage(df_fn(), path, stage, config_hash, model_hash)
