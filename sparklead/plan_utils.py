"""Driver-plan hygiene for iterative DataFrame loops.

Iterative algorithms that rebuild a frame from itself each round grow the
LOGICAL plan with round count — linearly when the previous frame is
referenced once (the self-edge discipline, CLAUDE.md), 2^n when it is
referenced twice. Catalyst's driver-side cost grows super-linearly with
that plan even in the single-reference case: measured on the
component-propagation loop, 12 rounds took 68 s (analysis-dominated) and
16 rounds OOM'd an 8 g driver during plan handling, independent of data
size (BENCH.md "deep-loop robustness"). Deep loops therefore need
periodic LINEAGE TRUNCATION — the standard iterative-graph pattern
(GraphFrames checkpoints the same way), done here as a parquet roundtrip
instead of RDD checkpoints so caller-owned cache contracts
(getPersistentRDDs pins) and eviction-recompute safety both hold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _fs_delete(df: DataFrame, path: str) -> None:
    """Best-effort recursive delete through the Hadoop FileSystem API —
    works for local paths AND cluster URIs (HDFS/S3), unlike shutil."""
    try:
        spark = df.sparkSession
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        fs.delete(hpath, True)
    except Exception:
        pass  # cleanup is advisory; never fail the job over scratch files


class LineageTruncator:
    """Owns the scratch lifecycle for ONE iterative loop's roundtrips.

    ``roundtrip(df)`` writes ``df`` to a scratch parquet and returns a
    re-read whose plan is a fresh scan, independent of how deep the
    input's lineage was. The write is EAGER. Lifecycle rules it enforces
    (round-6 review findings):

    * per-call ISOLATION — under a caller-supplied ``scratch_dir`` every
      truncator instance writes into its own uuid subdirectory, so two
      calls sharing one job-scratch URI can never overwrite each other's
      files (a stale cached frame from call A would otherwise silently
      recompute from call B's data);
    * SUPERSESSION CLEANUP, DEFERRED BY ONE — roundtrip N is deleted when
      N+2 is durably written, never when N+1 is: frames built BEFORE
      roundtrip N+1 (e.g. the loop's still-persisted previous iterate,
      unpersisted only after the roundtrip call returns) may still root
      their eviction-recompute at N, so an immediate delete would make
      correctness depend on the caller's unpersist ordering (round-6
      second review pass). A deep loop therefore holds at most TWO
      scratch files;
    * the LAST roundtrip file must OUTLIVE every downstream consumer of
      the returned frame — an evicted cache partition recomputes from it —
      so it is never auto-deleted; with the local tempdir default that is
      up to two vertex/corpus-sized dirs per deep call, reclaimed with
      /tmp. CLUSTER CALLERS OWN EVENTUAL RECLAMATION of their job-scratch
      URI: wipe it once the returned frames are released (there is
      deliberately no auto-delete hook — the truncator cannot know when
      the caller's cached frames die).

    ``scratch_dir=None`` (the local default) creates a driver-local temp
    dir — single-process correct only; ON A CLUSTER pass a job-scratch
    URI (HDFS/S3) reachable by every executor.
    """

    def __init__(self, scratch_dir: str | None = None, prefix: str = "sparklead_roundtrip"):
        self._scratch = scratch_dir
        self._prefix = prefix
        self._base: str | None = None
        self._seq = 0
        self._last: str | None = None
        self._prev: str | None = None

    def roundtrip(self, df: DataFrame) -> DataFrame:
        if self._base is None:
            if self._scratch is None:
                import tempfile

                self._base = tempfile.mkdtemp(prefix=self._prefix + "_")
            else:
                import uuid

                self._base = (
                    f"{self._scratch.rstrip('/')}/{self._prefix}_{uuid.uuid4().hex[:12]}"
                )
        self._seq += 1
        path = f"{self._base}/r{self._seq}"
        df.write.mode("overwrite").parquet(path)
        out = df.sparkSession.read.parquet(path)
        if self._prev is not None:
            _fs_delete(df, self._prev)
        self._prev = self._last
        self._last = path
        return out
