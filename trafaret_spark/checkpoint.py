"""Per-partition checkpoint/resume + lineage/metrics (SURVEY.md E13).

Unit of resumability: the entity-key *bucket* (hash(conv_id) mod N — the
same bucket that partitions the output table, see io.py). For each completed
bucket the manifest directory holds ``bucket=K.json`` with:

  * row counts (total / valid / quarantined) and per-code coercion-error
    counts — the lineage **metrics**;
  * input paths + an application/code fingerprint — the lineage **identity**;
  * wall-clock + spark application id — the lineage **provenance**.

``remaining_buckets`` diffs the manifest dir against the full bucket set, so
a rerun processes only missing buckets in ONE Spark job (a filter on the
bucket column — partition-pruned, no driver-side per-bucket loop), then
stamps their manifests. Dynamic partition overwrite keeps the data/manifest
pair idempotent: a bucket is only re-stamped after its data rewrite commits.

At 10^12 rows this is the standard manifest pattern: the expensive state is
keyed by a bounded number of buckets (64-4096), not by Spark task count, so
the manifest stays tiny regardless of cluster size.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["Manifest", "bucket_metrics"]


def bucket_metrics(validated: DataFrame, bucket_col: str = "bucket",
                   errors_col: str = "errors") -> DataFrame:
    """One row per bucket: total/valid counts + per-code error counts,
    computed in a single pass (map-side partial agg)."""
    has_err = errors_col in validated.columns
    err_size = F.size(F.col(errors_col)) if has_err else F.lit(0)
    counts = (validated.groupBy(bucket_col)
              .agg(F.count(F.lit(1)).alias("n_rows"),
                   F.sum((err_size == 0).cast("long")).alias("n_valid"),
                   F.sum((err_size > 0).cast("long")).alias("n_quarantined")))
    if not has_err:
        return counts.withColumn(
            "error_codes", F.map_from_arrays(F.array().cast("array<string>"),
                                             F.array().cast("array<long>")))
    # per-code counts via explode + two-level agg — never collects row-level
    # error lists into one array (unbounded at scale)
    codes = (validated
             .select(bucket_col, F.explode(F.col(errors_col)["code"]).alias("code"))
             .groupBy(bucket_col, "code").agg(F.count(F.lit(1)).alias("n"))
             .groupBy(bucket_col)
             .agg(F.map_from_entries(
                 F.collect_list(F.struct("code", "n"))).alias("error_codes")))
    return counts.join(codes, bucket_col, "left").withColumn(
        "error_codes",
        F.coalesce("error_codes",
                   F.map_from_arrays(F.array().cast("array<string>"),
                                     F.array().cast("array<long>"))))


class Manifest:
    """Checkpoint manifest over a local/DFS directory."""

    def __init__(self, manifest_dir: str, n_buckets: int):
        self.dir = manifest_dir
        self.n_buckets = n_buckets
        os.makedirs(manifest_dir, exist_ok=True)

    def _path(self, bucket: int) -> str:
        return os.path.join(self.dir, f"bucket={bucket}.json")

    def done_buckets(self) -> set:
        out = set()
        for f in os.listdir(self.dir):
            if f.startswith("bucket=") and f.endswith(".json"):
                out.add(int(f[len("bucket="):-len(".json")]))
        return out

    def remaining_buckets(self) -> list:
        return sorted(set(range(self.n_buckets)) - self.done_buckets())

    def stamp(self, bucket: int, metrics: dict, lineage: dict) -> None:
        rec = {"bucket": bucket, "completed_at": time.time(),
               "metrics": metrics, "lineage": lineage}
        tmp = self._path(bucket) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(rec, fh, sort_keys=True)
        os.replace(tmp, self._path(bucket))  # atomic: readers never see partials

    def stamp_from_metrics_df(self, metrics_df: DataFrame, lineage: dict,
                              bucket_col: str = "bucket") -> int:
        """Stamp every bucket present in a metrics frame; returns count.
        The metrics frame is tiny (≤ n_buckets rows) — collecting it is the
        one sanctioned driver-side materialization."""
        n = 0
        for row in metrics_df.collect():
            d = row.asDict()
            b = int(d.pop(bucket_col))
            if "error_codes" in d and d["error_codes"] is not None:
                d["error_codes"] = dict(d["error_codes"])
            self.stamp(b, d, lineage)
            n += 1
        return n

    def read(self, bucket: int) -> Optional[dict]:
        p = self._path(bucket)
        if not os.path.exists(p):
            return None
        with open(p) as fh:
            return json.load(fh)

    def summary(self) -> dict:
        done = self.done_buckets()
        totals = {"n_rows": 0, "n_valid": 0, "n_quarantined": 0}
        for b in done:
            m = self.read(b)["metrics"]
            for k in totals:
                totals[k] += int(m.get(k, 0))
        return {"buckets_done": len(done), "n_buckets": self.n_buckets, **totals}
