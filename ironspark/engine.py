"""CrawlEngine: the wave-loop driver (reference Engine, src/engine.rs:84-212).

The reference's five free-running threads (SpiderManager, Downloader,
PipelineManager, monitor, TUI — ``src/engine.rs:100-187``) collapse
into a synchronous loop over "waves"; concurrency lost between stages
is regained as partition parallelism inside each wave, and what is
gained is determinism (exact crawl-order replay) and snapshot
checkpointing (every wave commit is a resumable snapshot) — SURVEY.md
§3.4.

One wave = politeness-select → request hooks → fetch (corpus join) →
status filter + retry union → response hooks → parse (mapInPandas) →
split items/outlinks → canonicalize → seen-dedup → seq-extend →
frontier append. State tables (frontier, seen, items, crawl order,
metrics) are materialized per wave under the checkpoint dir — parquet
directories with a JSON manifest (the Iceberg-snapshot pattern behind
a minimal TableIO seam; swaps to real Iceberg where the runtime jar
exists). Idle shutdown (monitor.rs:62-72) = frontier-empty probe.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import tempfile
import threading
import time
from datetime import datetime, timezone
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ironspark.config import EngineConfig
from ironspark.fetch import fetch_from_corpus, http_fetch_stage
from ironspark.frontier import (
    _finish_frontier,
    drain_seq_caches,
    enqueue_outlinks,
    prepare_candidates,
    recrawl_due,
    seeds_to_frontier,
    with_global_seq,
)
from ironspark.metrics import rollup_wave_metrics, wave_metrics_fine
from ironspark.parse import parse_responses
from ironspark.pipeline import PipelineManager
from ironspark.politeness import robots_disallow_filter, select_wave
from ironspark.schemas import SEEDS_SCHEMA
from ironspark.seen import ShardedBloom, ShardedCuckoo
from ironspark.spider import Spider

# no `wave` data column: a frontier row's wave is its segment directory
# (see ironspark/frontier.py note — keeps per-wave plans literal-free)
_FRONTIER_COLS = [
    "url_canon", "url", "host", "spider_id", "seq", "attempt",
    "method", "headers", "body", "meta", "status",
]

_TRACE = os.environ.get("IRONSPARK_TRACE", "") not in ("", "0")


class _Tracer:
    """Phase wall-clock tracing (enable with IRONSPARK_TRACE=1)."""

    def __init__(self, wave: int):
        self.wave = wave
        self.t = time.monotonic()

    def mark(self, phase: str) -> None:
        if _TRACE:
            now = time.monotonic()
            print(f"[trace] wave={self.wave} {phase}: {now - self.t:.2f}s", flush=True)
            self.t = now


@dataclass
class CrawlStats:
    """Reference Engine::defer summary (src/engine.rs:190-212)."""

    waves: int = 0
    scheduled: int = 0
    fetched: int = 0
    failed: int = 0
    items: int = 0
    outlinks: int = 0
    deduped: int = 0
    unrouted: int = 0  # items with no pipeline chain (M7, manager.rs:96-98)
    dropped: int = 0  # accepted responses with no registered spider
    exhausted: int = 0
    closed_spiders: int = 0
    wall_s: float = 0.0
    run_dir: str = ""
    # per-wave lineage for steady-state throughput analysis
    wave_walls: list = field(default_factory=list)  # seconds per wave
    wave_scheduled: list = field(default_factory=list)
    wave_new: list = field(default_factory=list)
    wave_outlinks: list = field(default_factory=list)
    wave_frontier_rows: list = field(default_factory=list)  # delta rows written
    wave_seen_join: list = field(default_factory=list)  # resolved regime per wave

    @property
    def urls_per_sec(self) -> float:
        # the authoritative metric: frontier URLs scheduled+deduped/sec
        return (self.scheduled + self.deduped) / self.wall_s if self.wall_s else 0.0


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime jar is on the session's
    classpath (probe VERDICT r2 #5). The sandbox ships without it; a
    real deployment adds iceberg-spark-runtime and the engine's state
    tables transparently become real Iceberg tables."""
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001 — jar probe
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:  # noqa: BLE001 — Py4J wraps ClassNotFound
        return False


def make_table_io(spark: SparkSession, root: str) -> "TableIO":
    """Backend chosen by probe: real Iceberg when the runtime jar is
    present (or IRONSPARK_TABLE_BACKEND=iceberg), parquet-dir +
    JSON-manifest otherwise. IRONSPARK_TABLE_BACKEND=parquet forces the
    fallback even with the jar."""
    pref = os.environ.get("IRONSPARK_TABLE_BACKEND", "auto")
    if pref != "parquet" and (pref == "iceberg" or iceberg_available(spark)):
        return IcebergTableIO(spark, root)
    return TableIO(spark, root)


class TableIO:
    """Parquet-dir snapshot store with a JSON manifest (Iceberg seam)."""

    # engine-controlled table schemas: providing them to the reader
    # elides the per-read parquet footer-inference job (measured as a
    # swarm of 1-task jobs inside every wave's serial budget). `items`
    # is deliberately ABSENT — user pipelines may reshape item rows.
    SCHEMAS: dict = {}

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        if not TableIO.SCHEMAS:
            from ironspark.schemas import (
                CONSUMED_SCHEMA,
                CRAWL_ORDER_SCHEMA,
                FRONTIER_SCHEMA,
                METRICS_SCHEMA,
                SEEN_SCHEMA,
                STATUS_SCHEMA,
            )

            TableIO.SCHEMAS = {
                "frontier": FRONTIER_SCHEMA,
                "frontier_base": FRONTIER_SCHEMA,
                "seen": SEEN_SCHEMA,
                "order": CRAWL_ORDER_SCHEMA,
                "consumed": CONSUMED_SCHEMA,
                "metrics": METRICS_SCHEMA,
                "status": STATUS_SCHEMA,
            }

    def _reader(self, name: str):
        s = TableIO.SCHEMAS.get(name.split("/", 1)[0])
        return self.spark.read.schema(s) if s is not None else self.spark.read

    def path(self, name: str, wave: int | None = None) -> str:
        return (
            os.path.join(self.root, name)
            if wave is None
            else os.path.join(self.root, name, f"wave={wave}")
        )

    def write(
        self, df: DataFrame, name: str, wave: int | None = None, mode: str = "overwrite"
    ) -> None:
        df.write.mode(mode).parquet(self.path(name, wave))

    def write_rel(self, df: DataFrame, relpath: str, mode: str = "overwrite") -> None:
        df.write.mode(mode).parquet(os.path.join(self.root, relpath))

    def read_rel(self, relpaths: list[str]) -> DataFrame:
        # explicit leaf dirs, NO basePath: avoids partition-column
        # inference colliding with the `wave` data column
        return self._reader(relpaths[0]).parquet(
            *[os.path.join(self.root, p) for p in relpaths]
        )

    def read(self, name: str, wave: int | None = None) -> DataFrame:
        return self._reader(name).parquet(self.path(name, wave))

    def read_all_waves(self, name: str) -> DataFrame | None:
        base = os.path.join(self.root, name)
        if not os.path.isdir(base) or not os.listdir(base):
            return None
        return self._reader(name).option("basePath", base).parquet(
            *[os.path.join(base, d) for d in sorted(os.listdir(base)) if d.startswith("wave=")]
        )

    def exists(self, name: str) -> bool:
        return os.path.isdir(self.path(name))

    def rewrite(self, df: DataFrame, name: str) -> None:
        """Atomically replace a whole table (seen-set invalidation):
        write aside, swap directories — a crash never tears the table."""
        tmp = os.path.join(self.root, f"_{name}_rewrite")
        df.write.mode("overwrite").parquet(os.path.join(tmp, "wave=0"))
        shutil.rmtree(os.path.join(self.root, name))
        os.replace(tmp, os.path.join(self.root, name))

    def manifest(self) -> dict | None:
        p = os.path.join(self.root, "manifest.json")
        if not os.path.exists(p):
            return None
        with open(p) as fh:
            return json.load(fh)

    def commit(self, manifest: dict) -> None:
        p = os.path.join(self.root, "manifest.json")
        tmp = p + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, p)  # atomic: a crash never leaves a torn manifest
        self._write_snapshot(manifest)

    # -- Iceberg-shaped snapshot chain ---------------------------------
    # Every commit also appends a snapshot under <root>/metadata/: a
    # snap-<id>.json carrying the parent pointer + a manifest list, one
    # manifest-<id>-<table>.json per state table enumerating the
    # concrete parquet data files (path / size / format) visible at
    # commit time, and a version-hint.text updated LAST as the commit
    # point (the Iceberg hadoop-catalog protocol). This makes the
    # "resumable from snapshots" claim testable without the runtime
    # jar: any engine (DuckDB in tests) can read a checkpoint strictly
    # from the files a snapshot manifest lists, and a lost
    # manifest.json is reconstructible from the snapshot summary.

    def _meta_dir(self) -> str:
        return os.path.join(self.root, "metadata")

    def _table_roots(self) -> dict[str, str]:
        """name -> directory holding that state table's data files."""
        out: dict[str, str] = {}
        if os.path.isdir(self.root):
            for d in sorted(os.listdir(self.root)):
                p = os.path.join(self.root, d)
                if os.path.isdir(p) and d != "metadata" and not d.startswith("_"):
                    out[d] = p
        return out

    @staticmethod
    def _data_files(table_root: str) -> list[dict]:
        files = []
        for dirpath, dirnames, filenames in os.walk(table_root):
            # skip work dirs (_temporary, .staging) but keep partition
            # dirs whose column name is underscore-prefixed (_wp=N)
            dirnames[:] = [
                d for d in dirnames
                if "=" in d or not d.startswith(("_", "."))
            ]
            for f in sorted(filenames):
                if f.endswith(".parquet"):
                    fp = os.path.join(dirpath, f)
                    files.append(
                        {
                            "file-path": fp,
                            "file-size-in-bytes": os.path.getsize(fp),
                            "file-format": "PARQUET",
                        }
                    )
        return files

    def _write_snapshot(self, manifest: dict) -> None:
        meta = self._meta_dir()
        os.makedirs(meta, exist_ok=True)
        parent = self.current_snapshot_id()
        sid = 0 if parent is None else parent + 1
        manifest_list = []
        for name, troot in self._table_roots().items():
            mf = f"manifest-{sid}-{name}.json"
            with open(os.path.join(meta, mf + ".tmp"), "w") as fh:
                json.dump(
                    {"table": name, "data-files": self._data_files(troot)},
                    fh,
                )
            os.replace(
                os.path.join(meta, mf + ".tmp"), os.path.join(meta, mf)
            )
            manifest_list.append(mf)
        snap = {
            "snapshot-id": sid,
            "parent-snapshot-id": parent,
            "sequence-number": sid,
            "timestamp-ms": int(time.time() * 1000),
            "operation": "append",
            "manifest-list": manifest_list,
            "summary": manifest,
        }
        with open(os.path.join(meta, f"snap-{sid}.json.tmp"), "w") as fh:
            json.dump(snap, fh)
        os.replace(
            os.path.join(meta, f"snap-{sid}.json.tmp"),
            os.path.join(meta, f"snap-{sid}.json"),
        )
        # version-hint LAST: readers never see a hinted-at snapshot
        # whose manifests aren't fully on disk
        hint = os.path.join(meta, "version-hint.text")
        with open(hint + ".tmp", "w") as fh:
            fh.write(str(sid))
        os.replace(hint + ".tmp", hint)

    def current_snapshot_id(self) -> int | None:
        hint = os.path.join(self._meta_dir(), "version-hint.text")
        if not os.path.exists(hint):
            return None
        with open(hint) as fh:
            return int(fh.read().strip())

    def snapshot(self, snapshot_id: int | None = None) -> dict | None:
        sid = self.current_snapshot_id() if snapshot_id is None else snapshot_id
        if sid is None:
            return None
        p = os.path.join(self._meta_dir(), f"snap-{sid}.json")
        if not os.path.exists(p):
            return None
        with open(p) as fh:
            return json.load(fh)

    def snapshot_table_files(
        self, name: str, snapshot_id: int | None = None
    ) -> list[str]:
        """Data files of one state table as listed by a snapshot's
        manifest — the strictly-metadata-driven read path."""
        snap = self.snapshot(snapshot_id)
        if snap is None:
            return []
        mf = f"manifest-{snap['snapshot-id']}-{name}.json"
        if mf not in snap["manifest-list"]:
            return []
        with open(os.path.join(self._meta_dir(), mf)) as fh:
            return [d["file-path"] for d in json.load(fh)["data-files"]]

    def read_at_snapshot(
        self, name: str, snapshot_id: int | None = None
    ) -> DataFrame:
        files = self.snapshot_table_files(name, snapshot_id)
        if not files:
            raise FileNotFoundError(
                f"table {name!r} absent from snapshot {snapshot_id}"
            )
        return self._reader(name).parquet(*files)

    def restore_manifest(self, snapshot_id: int | None = None) -> dict:
        """Rewrite manifest.json from a snapshot's summary (recovery
        after a lost/torn engine manifest) WITHOUT minting a new
        snapshot; returns the restored manifest."""
        snap = self.snapshot(snapshot_id)
        if snap is None:
            raise FileNotFoundError(f"no snapshot {snapshot_id} in {self.root}")
        man = snap["summary"]
        p = os.path.join(self.root, "manifest.json")
        with open(p + ".tmp", "w") as fh:
            json.dump(man, fh)
        os.replace(p + ".tmp", p)
        return man


class IcebergTableIO(TableIO):
    """TableIO on a REAL Iceberg hadoop catalog (jar present; see
    make_table_io). The mapping docs/SCALE.md specifies, made concrete:

    * one Iceberg table per state table (frontier, seen, items, order,
      metrics, status, consumed, frontier_base), partitioned by the
      hidden ``_wp`` wave column → ``read(name, wave)`` partition-prunes;
    * per-wave write = append snapshot (delta segment);
    * per-wave overwrite = dynamic partition overwrite on ``_wp``;
    * seen rewrite (invalidation) = createOrReplace (RTAS);
    * the engine's amortized frontier compaction corresponds to
      ``rewrite_data_files`` — here it materializes the pending set
      into the ``frontier_base`` table exactly as on parquet.

    The JSON run manifest (next_wave/next_seq/segments/consumed) stays
    file-based: it is ENGINE state spanning several tables, not table
    state — each commit() still lands after the tables' own snapshot
    commits, so a resume sees only fully-committed waves.
    """

    def __init__(self, spark: SparkSession, root: str):
        super().__init__(spark, root)
        wh = os.path.join(root, "_iceberg_warehouse")
        # Spark instantiates catalog objects once per name and Iceberg's
        # SparkCatalog wraps a CachingCatalog — a FIXED catalog name
        # would keep resolving against the first run_dir's warehouse for
        # the whole session.  Deriving the name from the run root makes
        # each run_dir its own catalog; cache-enabled=false also drops
        # stale table metadata when a run_dir is wiped and recreated.
        digest = hashlib.md5(os.path.abspath(root).encode()).hexdigest()[:12]
        self.CATALOG = f"ironspark_{digest}"
        spark.conf.set(
            f"spark.sql.catalog.{self.CATALOG}",
            "org.apache.iceberg.spark.SparkCatalog",
        )
        spark.conf.set(f"spark.sql.catalog.{self.CATALOG}.type", "hadoop")
        spark.conf.set(f"spark.sql.catalog.{self.CATALOG}.warehouse", wh)
        spark.conf.set(
            f"spark.sql.catalog.{self.CATALOG}.cache-enabled", "false"
        )
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {self.CATALOG}.state")

    def _ident(self, name: str) -> str:
        return f"{self.CATALOG}.state.{name}"

    def _table_exists(self, name: str) -> bool:
        return self.spark.catalog.tableExists(self._ident(name))

    @staticmethod
    def _split_rel(relpath: str) -> tuple[str, int]:
        name, _, wave = relpath.partition("/wave=")
        return name, int(wave)

    def _write(self, df: DataFrame, name: str, wave: int, mode: str) -> None:
        df = df.withColumn("_wp", F.lit(int(wave)))
        ident = self._ident(name)
        if not self._table_exists(name):
            df.writeTo(ident).using("iceberg").partitionedBy(
                F.col("_wp")
            ).create()
        elif mode == "append":
            df.writeTo(ident).append()
        else:
            df.writeTo(ident).overwritePartitions()

    def write(self, df, name, wave=None, mode="overwrite"):
        self._write(df, name, wave or 0, mode)

    def write_rel(self, df, relpath, mode="overwrite"):
        name, wave = self._split_rel(relpath)
        self._write(df, name, wave, mode)

    def read(self, name, wave=None):
        t = self.spark.table(self._ident(name))
        if wave is not None:
            t = t.filter(F.col("_wp") == int(wave))
        return t.drop("_wp")

    def read_rel(self, relpaths):
        parts = [self._split_rel(r) for r in relpaths]
        out = None
        for name, wave in parts:
            df = self.read(name, wave)
            out = df if out is None else out.unionByName(df)
        return out

    def read_all_waves(self, name):
        if not self._table_exists(name):
            return None
        t = self.spark.table(self._ident(name))
        if "wave" in t.columns:
            return t.drop("_wp")
        # state rows carry no wave data column (plan stability — see
        # frontier.py note); surface the partition value as `wave`,
        # mirroring the parquet backend's directory-derived column
        return t.withColumnRenamed("_wp", "wave")

    def exists(self, name):
        return self._table_exists(name)

    def rewrite(self, df, name):
        df.withColumn("_wp", F.lit(0)).writeTo(
            self._ident(name)
        ).using("iceberg").partitionedBy(F.col("_wp")).createOrReplace()

    def _table_roots(self) -> dict[str, str]:
        """Engine-level snapshots enumerate the hadoop-catalog
        warehouse layout (<root>/_iceberg_warehouse/state/<table>);
        the .parquet filter in _data_files skips Iceberg's own
        avro/json metadata, so a snapshot manifest lists exactly the
        data files — readable by any engine without the catalog."""
        wh = os.path.join(self.root, "_iceberg_warehouse", "state")
        out: dict[str, str] = {}
        if os.path.isdir(wh):
            for d in sorted(os.listdir(wh)):
                p = os.path.join(wh, d)
                if os.path.isdir(p):
                    out[d] = p
        return out


class CrawlEngine:
    """The public engine API (reference Engine::new, src/engine.rs:39-82)."""

    def __init__(
        self,
        spark: SparkSession,
        pages: DataFrame,
        spiders: dict[int, Spider],
        config: EngineConfig | None = None,
        robots: DataFrame | None = None,
        pipelines: PipelineManager | None = None,
        redirects: DataFrame | None = None,
    ):
        self.spark = spark
        self.pages = pages
        self.spiders = spiders
        self.cfg = config or EngineConfig()
        self.robots = robots
        self.pipelines = pipelines
        self.redirects = redirects
        # middleware hooks (north rule: request/response hooks are
        # DataFrame transform stages; reference dataflow engine.rs:100-188)
        self.request_hooks: list[Callable[[DataFrame], DataFrame]] = []
        self.response_hooks: list[Callable[[DataFrame], DataFrame]] = []
        # S6 cookie store (reference src/config.rs:14, reqwest jar in
        # downloader.rs:52): per-host cookie strings harvested from
        # response set_cookie lineage, injected as a `cookie` header on
        # the next wave's requests when cfg.store_cookies. Driver-side
        # dict — the honest analog of the reference's in-process jar
        # (bounded by hosts-with-cookies; shipped per wave as a
        # broadcast join).
        self._cookie_jar: dict[str, str] = {}
        # per-wave persisted intermediates, released at wave end
        self._wave_caches: list[DataFrame] = []
        self._bloom: ShardedBloom | ShardedCuckoo | None = None
        # column-pruned corpus view; the scan carries only what the
        # fetch join needs (url, html, warc_ts) — Catalyst would prune
        # anyway, this makes it explicit and keeps text/lang out.
        # pages may be None when fetch_strategy="http" (live fetch).
        self._pages_view = (
            pages.select("url", "html", "warc_ts") if pages is not None else None
        )
        # url-only corpus side for the fetch's miss anti-join: built
        # lazily ONCE and persisted as a single partition, so the
        # per-wave broadcast build scans a compact in-memory column
        # instead of re-launching a full parquet-footprint scan + 400k
        # row collect every wave (~1s/wave of driver-serial floor).
        self._pages_urls: DataFrame | None = None
        # wall clock for fetch_ts stamping + recrawl due checks;
        # injectable via cfg.extra["clock"] so tests can age a crawl
        self._clock: Callable[[], datetime] | None = (
            self.cfg.extra.get("clock") if self.cfg.extra else None
        )

    def _now(self) -> datetime:
        """Naive-UTC wall clock (session tz is UTC; NTZ-safe literal)."""
        dt = self._clock() if self._clock is not None else datetime.now(timezone.utc)
        if dt.tzinfo is not None:
            dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
        return dt

    def _prepared_pages(self) -> DataFrame:
        return self._pages_view

    def _scan_split_bytes(self) -> int | None:
        """maxPartitionBytes targeting cfg.scan_tasks_per_core file-scan
        tasks per core over the fetch corpus, clamped to [4 MB, 128 MB].

        None (= leave the session default) when the override is
        disabled, there is no file-backed corpus, or sizes can't be
        read (non-local filesystem) — the 128 MB clamp means a corpus
        big enough to be remote is also big enough not to need this.
        """
        k = self.cfg.scan_tasks_per_core
        if not k or self.pages is None:
            return None
        try:
            total = 0
            for uri in self.pages.inputFiles():
                path = uri
                if path.startswith("file:"):
                    path = path[5:]
                    while path.startswith("//"):
                        path = path[1:]
                elif "://" in path:
                    return None
                total += os.path.getsize(path)
        except Exception:
            return None
        if total <= 0:
            return None
        par = max(self.spark.sparkContext.defaultParallelism, 1)
        return min(128 << 20, max(4 << 20, total // (k * par)))

    def _prepared_page_urls(self) -> DataFrame | None:
        if self._pages_urls is None and self._pages_view is not None:
            self._pages_urls = (
                self._pages_view.select("url").coalesce(1).persist()
            )
        return self._pages_urls

    def register_request_hook(self, fn: Callable[[DataFrame], DataFrame]) -> None:
        self.request_hooks.append(fn)

    def register_response_hook(self, fn: Callable[[DataFrame], DataFrame]) -> None:
        self.response_hooks.append(fn)

    # -- seen-set backends ---------------------------------------------------

    def _resolve_seen_join(
        self, seen_rows: int | None, wave_outlinks: int | None = None
    ) -> str:
        """Resolve cfg.seen_join ("auto") to a physical strategy.

        Regime choice (same pattern as fetch_strategy), ordered by
        crawl age: "broadcast" while the seen set is comparable to the
        wave (early waves — one small driver build, no shuffle of
        either side); "flip" once seen outgrows the wave
        (seen_flip_ratio x the wave's outlink count, known for free
        from the fused metrics pass) — two O(wave) broadcasts and a
        parallel O(seen) scan instead of an O(seen) driver build that
        would otherwise grow with crawl progress and floor the
        politeness tail's small waves; "shuffle_hash" beyond
        seen_broadcast_max_rows — O(seen) stays distributed (the
        10^10-url plan) at the cost of one candidate shuffle per
        wave. auto switches on the engine's own counters — NOT on
        AQE's estimate, which would silently flip strategies mid-crawl
        and re-plan.
        """
        mode = self.cfg.seen_join
        if mode == "auto":
            if (
                seen_rows is None
                or seen_rows > self.cfg.seen_broadcast_max_rows
            ):
                mode = "shuffle_hash"
            elif (
                wave_outlinks is not None
                and seen_rows > self.cfg.seen_flip_ratio * wave_outlinks
            ):
                mode = "flip"
            else:
                mode = "broadcast"
        # recorded per wave into CrawlStats (the main wave dedup is the
        # last resolution before the wave's stats append) — the regime
        # transition log the scaling artifact discloses
        self._last_seen_join = mode
        return mode

    def _filter_new(
        self,
        candidates: DataFrame,
        seen: DataFrame,
        seen_rows: int | None = None,
        wave_outlinks: int | None = None,
    ) -> DataFrame:
        """Exact anti-join; Bloom/cuckoo-pruned in the shuffle regime.

        The prune exists FOR the shuffle regime: it keeps definitely-
        new rows out of the candidate shuffle, which is the join's
        cost at 10^10 seen urls. In the broadcast regime the anti-join
        is already map-side with NO shuffle of either input, so the
        prune's tag stage (an Arrow round-trip over every candidate
        url) + persist + two-branch union is pure per-wave overhead —
        measured ~1.7s/wave flat at 400k pages — and is skipped. The
        prune filter itself is still BUILT every wave (tail task), so
        crossing the regime boundary mid-crawl starts with warm
        slices.

        ``tagged`` is persisted: the definite-new / maybe-seen split is a
        UNION of two filters over it, and without the cache the whole
        upstream candidate chain (dedup groupBy + Bloom UDF) executed
        once per branch inside the same job (measured ~2x the dedup
        phase). Released in the wave's unpersist sweep.
        """
        mode = self._resolve_seen_join(seen_rows, wave_outlinks)
        if (
            mode == "shuffle_hash"
            and self.cfg.seen_backend in ("bloom", "cuckoo")
            and self._bloom is not None
            and self._bloom.n_slices
        ):
            seen = seen.hint("shuffle_hash")
            maybe_seen = self._bloom.maybe_seen_udf()
            tagged = candidates.withColumn(
                "_maybe", maybe_seen(F.col("url_canon"))
            ).persist()
            self._wave_caches.append(tagged)
            definite_new = tagged.filter(~F.col("_maybe")).drop("_maybe")
            confirm = (
                tagged.filter(F.col("_maybe"))
                .drop("_maybe")
                .join(seen, "url_canon", "left_anti")
            )
            return definite_new.unionByName(confirm)
        if mode == "flip":
            # candidates is persisted so the dedup groupBy above it
            # runs once: the dupes broadcast materializes the cache,
            # the anti probe then reads it. Both broadcasts are
            # O(wave); the O(seen) side is only ever SCANNED, in
            # parallel — nothing about this plan grows a serial cost
            # with crawl progress.
            cand = candidates.persist()
            self._wave_caches.append(cand)
            dupes = seen.join(
                F.broadcast(cand.select("url_canon")),
                "url_canon",
                "left_semi",
            )
            return cand.join(
                F.broadcast(dupes.select("url_canon")),
                "url_canon",
                "left_anti",
            )
        seen = (
            F.broadcast(seen)
            if mode == "broadcast"
            else seen.hint("shuffle_hash")
        )
        return candidates.join(seen, "url_canon", "left_anti")

    def _bloom_add(self, new_urls: DataFrame) -> None:
        """Add this wave's new urls to the prune filter. bloom: ONE
        delta slice, O(new) distributed build, one fixed-size broadcast
        (ShardedBloom). cuckoo: driver-side fingerprint inserts into
        hash-routed shards — the DELETABLE variant for re-crawl
        invalidation (see invalidate_seen)."""
        if self.cfg.seen_backend == "bloom":
            if self._bloom is None:
                self._bloom = ShardedBloom(
                    self.spark,
                    self.cfg.bloom_capacity,
                    self.cfg.bloom_fpp,
                    self.cfg.bloom_max_slices,
                )
            self._bloom.add_delta(new_urls.select("url_canon"), "url_canon")
        elif self.cfg.seen_backend == "cuckoo":
            if self._bloom is None:
                self._bloom = ShardedCuckoo(
                    self.spark,
                    self.cfg.bloom_capacity,
                    self.cfg.cuckoo_shards,
                )
            self._bloom.add_df(new_urls.select("url_canon"), "url_canon")

    def invalidate_seen(self, run_dir: str, urls: list[str]) -> int:
        """Re-crawl invalidation: remove urls from the seen set so they
        can be enqueued again (the reference has no analog — its seen
        set is the example spider's process-lifetime HashSet; this is
        the north rule's 'cuckoo fallback for deletable entries').

        Exactness: the seen TABLE is compacted minus the urls (one
        rewrite). Prune state: cuckoo shards delete the fingerprints
        (prune stays tight); a Bloom prune cannot unset bits, so it goes
        stale-SAFE — a deleted url stays "maybe seen" and is re-admitted
        by the exact confirm join, costing one join row, never
        correctness. Returns the number of seen rows removed.
        """
        io = make_table_io(self.spark, run_dir)
        seen = io.read_all_waves("seen")
        if seen is None or not urls:
            return 0
        url_df = F.broadcast(
            self.spark.createDataFrame([(u,) for u in urls], "url_canon string")
        )
        removed = seen.join(url_df, "url_canon", "left_semi").count()
        if removed:
            kept = seen.join(url_df, "url_canon", "left_anti")
            io.rewrite(kept, "seen")  # atomic swap / Iceberg RTAS
        if isinstance(self._bloom, ShardedCuckoo):
            zeroed = self._bloom.delete_urls(urls)
            if zeroed:
                # collision repair: a delete can zero a (fp, bucket)
                # shared with a SURVIVING url (cuckoo false negative —
                # would break exact dedup); re-insert such survivors
                # from the rewritten seen table (seen.py docstring).
                # Gated on entries ACTUALLY zeroed, not seen-table rows:
                # an invalidated url absent from seen can still
                # (shard, fp, bucket)-collide with a surviving url
                self._bloom.resync_after_delete(io.read("seen"))
        return removed

    def _admit_recrawls(
        self, io, run_dir: str, wave: int, next_seq: int, segments: list[str]
    ) -> int:
        """Frontier-empty freshness tick — the crawl→age→recrawl
        composition of a CONTINUOUS crawl (the reference crawls once
        and stops; the north rule's deletable cuckoo path exists for
        exactly this cycle).

        Reads the fetch history (order sink: one row per scheduled
        fetch with host + fetch_ts), selects due URLs stalest-first
        under cfg.recrawl_per_host_budget (frontier.recrawl_due — the
        same per-host politeness shape as first-visit scheduling),
        removes them from the exact seen table AND the prune structures
        (invalidate_seen: atomic table rewrite + cuckoo fingerprint
        delete + collision resync), then appends them to the live
        frontier segment with fresh seq numbers in global stalest-first
        order and re-records them as seen (they are enqueued again, so
        later-discovered duplicates must still dedup). Returns the seq
        numbers consumed (0 = nothing due → idle shutdown proceeds).

        Scale shape: the due set is budget-bounded (hosts ×
        recrawl_per_host_budget); selection, owner re-join, and seq
        assignment all stay distributed — only the invalidation batch
        is collected, because the cuckoo fingerprint delete is
        driver-side by design (deletions rare; seen.py). The history
        scan is one hash-agg per tick, and ticks only fire at
        frontier-empty, never per wave.
        """
        cfg = self.cfg
        history = io.read_all_waves("order")
        if history is None:
            return 0
        hist = history.filter(F.col("fetch_ts").isNotNull())
        due = recrawl_due(
            hist.select(
                F.col("url_canon").alias("url"),
                "host",
                F.col("fetch_ts").alias("ts"),
            ),
            self._now(),
            cfg.recrawl_interval_s,
            cfg.recrawl_per_host_budget,
        )
        # re-home each due url to the spider that fetched it last
        # (deterministic tie-break on seq within the same wave stamp)
        owner = hist.groupBy(F.col("url_canon").alias("url")).agg(
            F.max_by(
                "spider_id", F.struct("fetch_ts", "seq")
            ).alias("spider_id")
        )
        f, n = with_global_seq(
            due.join(owner, "url", "left").select(
                F.col("url").alias("url_canon"),
                F.col("url"),
                "host",
                "spider_id",
                (-F.col("age_seconds")).alias("_neg_age"),
            ),
            ["_neg_age", "url"],
            next_seq,
        )
        if n == 0:
            return 0
        inj = _finish_frontier(f.drop("_neg_age")).persist()
        urls = [r["url_canon"] for r in inj.select("url_canon").collect()]
        # clear membership FIRST (exact rewrite + cuckoo delete +
        # resync), then re-record the re-admitted urls as seen
        self.invalidate_seen(run_dir, urls)
        io.write_rel(inj, segments[-1], mode="append")
        if cfg.dedup:
            io.write(inj.select("url_canon"), "seen", wave, mode="append")
            if cfg.seen_backend in ("bloom", "cuckoo"):
                self._bloom_add(inj)
        inj.unpersist()
        return n

    # -- run ------------------------------------------------------------------

    def run(
        self,
        seeds=None,
        run_dir: str | None = None,
        resume: bool = False,
        staged_seeds: list | None = None,
    ) -> CrawlStats:
        """Run the crawl to frontier-empty (or max_waves).

        seeds: DataFrame/list seeded at wave 0. staged_seeds: optional
        list of further seed DataFrames ("pending spiders", reference
        src/spider/manager.rs:239-279) — one group is activated per
        wave, but only while the frontier holds no more than
        cfg.scheduler_holding_threshold pending requests (admission
        control F4, SCHEDULER_HOLDING_THRESOLD src/spider/manager.rs:34-36).
        """
        cfg = self.cfg
        run_dir = run_dir or cfg.checkpoint_dir or tempfile.mkdtemp(prefix="ironspark_")
        io = make_table_io(self.spark, run_dir)
        stats = CrawlStats(run_dir=run_dir)
        self._metrics_buf: list[dict] = []
        self._status_buf: list[dict] = []
        # independent sink writes (order, items) run as concurrent Spark
        # actions so file I/O overlaps the wave's compute; drained at
        # each wave's end before commits/unpersist (see wave loop)
        io_pool = ThreadPoolExecutor(max_workers=3)
        t_start = time.monotonic()

        # Selective AQE: adaptive execution turns EVERY action into a
        # chain of sequential stage-jobs with a driver re-optimization
        # between each. For the one heavy job per wave (fetch + Arrow
        # parse) that is what we want at scale — runtime skew-join
        # splitting and partition coalescing. For the wave's many tiny
        # bookkeeping actions (seq counts, sink writes, probes) the
        # re-optimization rounds ARE the cost: measured ~1.4s for a
        # count whose task time is ~50ms, flat across core counts —
        # i.e. pure driver-serial floor, the 2v8 scaling drag
        # (BENCH.md round-4). So AQE is OFF as the wave-loop steady
        # state and flipped on only around the heavy collect.
        _had_aqe = (
            str(self.spark.conf.get("spark.sql.adaptive.enabled", "false"))
            .lower() == "true"
        )

        def _aqe(on: bool) -> None:
            if _had_aqe:
                self.spark.conf.set(
                    "spark.sql.adaptive.enabled", "true" if on else "false"
                )

        # Corpus-scan split sizing (cfg.scan_tasks_per_core): on small
        # corpora Spark's default split math gives ~1 scan task per
        # core, so the fetch+parse stage runs at the speed of its
        # slowest split. Size splits for >=k tasks/core; the 128 MB
        # cap keeps this inert at real corpus scale. Restored on exit.
        _prev_mpb = self.spark.conf.get(
            "spark.sql.files.maxPartitionBytes", None
        )
        _mpb = self._scan_split_bytes()
        if _mpb is not None:
            self.spark.conf.set("spark.sql.files.maxPartitionBytes", str(_mpb))

        def _restore_mpb() -> None:
            if _mpb is None:
                return
            if _prev_mpb is None:
                self.spark.conf.unset("spark.sql.files.maxPartitionBytes")
            else:
                self.spark.conf.set(
                    "spark.sql.files.maxPartitionBytes", _prev_mpb
                )

        # Frontier state is MERGE-ON-READ (the Iceberg pattern on the
        # TableIO seam): `segments` lists delta dirs (each wave appends
        # only its retry+new rows), `consumed` lists the (seq, attempt)
        # keys scheduled so far; pending = segments ⟕̸ consumed. The
        # backlog is never rewritten per wave — only on amortized
        # compaction or the fast-path reset (see end of wave loop).
        if resume:
            man = io.manifest()
            if man is None:
                raise FileNotFoundError(f"no manifest to resume in {run_dir}")
            wave = man["next_wave"]
            next_seq = man["next_seq"]
            segments = man.get("segments", [f"frontier/wave={wave}"])
            consumed = man.get("consumed", [])
            consumed_rows = man.get("consumed_rows", 0)
            stats.deduped = man.get("deduped", 0)
            if io.exists("metrics"):
                self._metrics_buf = [
                    r.asDict() for r in io.read("metrics").collect()
                ]
            if io.exists("status"):
                self._status_buf = [
                    r.asDict() for r in io.read("status").collect()
                ]
            if cfg.seen_backend in ("bloom", "cuckoo") and cfg.dedup:
                # rebuild the prune filter from the full seen table
                self._bloom_add(io.read("seen"))
        else:
            if os.path.isdir(run_dir):
                shutil.rmtree(run_dir)
            io = make_table_io(self.spark, run_dir)
            if isinstance(seeds, (list, tuple)):
                import pandas as pd

                seeds = self.spark.createDataFrame(
                    pd.DataFrame(seeds, columns=["spider_id", "url", "seed_rank"]),
                    SEEDS_SCHEMA,
                )
            front0, n_seed = seeds_to_frontier(seeds, dedup=cfg.dedup)
            front0 = robots_disallow_filter(front0, self.robots if cfg.respect_robots else None)
            io.write(front0, "frontier", 0)
            front0 = io.read("frontier", 0)
            # seen is APPEND-ONLY: each wave dir holds only that wave's
            # new urls, disjoint by construction (anti-join before
            # enqueue) — reading it is a plain multi-dir scan, no
            # union/distinct job ever runs over the full set.
            io.write(front0.select("url_canon"), "seen", 0)
            # duplicate seeds consume seq numbers (spec seed loop,
            # tests/reference_executor.py): advance by the full numbered
            # count, never max(seq) over surviving rows — if the LAST
            # seed in order is a duplicate, max() would re-issue its seq
            # to the first outlink and diverge from reference ordering.
            next_seq = n_seed
            wave = 0
            segments = ["frontier/wave=0"]
            consumed = []
            consumed_rows = 0
            io.commit(
                {
                    "next_wave": 0,
                    "next_seq": int(next_seq),
                    "deduped": 0,
                    "segments": segments,
                    "consumed": consumed,
                    "consumed_rows": 0,
                }
            )
            if cfg.seen_backend in ("bloom", "cuckoo") and cfg.dedup:
                self._bloom_add(front0)

        def pending_view() -> DataFrame:
            """Merge-on-read pending set: delta segments minus the
            scheduled (seq, attempt) keys since the last compaction."""
            df = io.read_rel(segments)
            if consumed:
                keys = io.read_rel(consumed).select("seq", "attempt")
                df = df.join(keys, ["seq", "attempt"], "left_anti")
            return df

        # L3 deactivation sweep state: per-spider pending counts,
        # maintained incrementally (reference closes a spider as soon
        # as it has zero in-flight work, src/spider/manager.rs:188-199)
        spider_pending: dict[int, int] = {}
        closed_spiders: set[int] = set()
        if cfg.track_spiders:
            spider_pending = {
                int(r["spider_id"]): r["cnt"]
                for r in pending_view().groupBy("spider_id").agg(
                    F.count("*").alias("cnt")
                ).collect()
            }

        _aqe(False)  # wave-loop steady state (restored before return;
        # an exception leaves it off, which is safe — only the wave's
        # single heavy job wants it on)
        pending_count = None  # unknown -> probe once
        # handle to the PREVIOUS wave's overlapped durable tail
        # (frontier segment + seen delta + bloom slice, ONE chained
        # io_pool task); every seen-set consumer awaits it first.
        # frontier_done gates only the frontier-segment stage, for
        # readers that need the DIRECTORY but not the seen set.
        seen_fut = None
        release_after_seen: list = []
        frontier_done: threading.Event | None = None
        prev_front = None        # previous wave's front_next cache
        pending_handoff = None   # live DataFrame for next wave's pending
        handoff_streak = 0

        def _await_frontier():
            if frontier_done is not None:
                frontier_done.wait()

        def _await_seen():
            nonlocal seen_fut, release_after_seen
            if seen_fut is not None:
                seen_fut.result()
                seen_fut = None
                for df in release_after_seen:
                    df.unpersist()
                release_after_seen = []

        while wave < cfg.max_waves:
            if pending_handoff is not None:
                # fast-path handoff: last wave's delta IS the whole
                # pending set and its cached frame is live — plan the
                # wave against it; the parquet read-back (and the wait
                # for the overlapped segment write) disappears from the
                # critical path
                pending = pending_handoff
                pending_handoff = None
            else:
                _await_frontier()  # segment dir complete before listing
                pending = pending_view()
            if pending_count is None:
                pending_count = pending.count()

            # spider admission (F4/L2): activate one pending seed group
            # per wave while the frontier holds <= threshold requests
            # (reference try_activate_pending_spider,
            # src/spider/manager.rs:239-279, threshold :34-36)
            if staged_seeds and pending_count <= cfg.scheduler_holding_threshold:
                _await_frontier()  # injection appends to segments[-1]
                grp = staged_seeds.pop(0)
                inj, n_grp = seeds_to_frontier(
                    grp, dedup=cfg.dedup, base_seq=next_seq
                )
                inj = robots_disallow_filter(
                    inj, self.robots if cfg.respect_robots else None
                )
                if cfg.dedup:
                    _await_seen()
                    inj = self._filter_new(
                        inj, io.read_all_waves("seen"), seen_rows=next_seq
                    )
                inj = inj.persist()
                n_inj = inj.count()
                if n_inj:
                    io.write_rel(inj, segments[-1], mode="append")
                    pending = pending_view()
                    if cfg.dedup:
                        io.write(
                            inj.select("url_canon"), "seen", wave, mode="append"
                        )
                        self._bloom_add(inj)
                inj.unpersist()
                # every numbered seed consumes a seq — including ones
                # dropped as duplicates or already-seen (spec seed loop
                # advances the counter before its dedup check)
                next_seq += n_grp
                pending_count += n_inj

            # idle shutdown: frontier empty AND no pending spiders
            # (reference condition monitor.rs:62-68 includes
            # pending_spiders == 0)
            if pending_count == 0:
                if staged_seeds:
                    continue  # same-wave re-tick: activate the next group
                if cfg.recrawl_interval_s is not None:
                    # continuous crawl: at the frontier-empty point,
                    # tick the freshness scheduler — due URLs clear
                    # their seen fingerprints and re-enter the frontier
                    # stalest-first (bounded overall by max_waves)
                    _await_seen()
                    _await_frontier()
                    n_re = self._admit_recrawls(
                        io, run_dir, wave, next_seq, segments
                    )
                    if n_re:
                        next_seq += n_re
                        pending_count = None
                        continue
                break

            tr = _Tracer(wave)
            t_wave = time.monotonic()

            # schedule (F3/F7): politeness window-rank + global cap
            selected, _deferred = select_wave(
                pending, self.robots if cfg.respect_robots else None, cfg
            )
            # Re-balance after politeness: the window rank leaves the
            # batch hash-partitioned by HOST, so a mega-domain (80% of
            # URLs) lands in ONE partition and the whole fetch+parse
            # stage inherits that skew (one straggler task does 80% of
            # the work — measured). A cheap shuffle of the body-free
            # scheduled rows by url_canon restores uniform parallelism
            # for everything downstream. Persisted PRE-hook: the same
            # cached rows feed the fetch (post-hook), the order table,
            # the retry rejoin, and the consumed-keys tombstones.
            nparts = max(self.spark.sparkContext.defaultParallelism, 1)
            selected = (
                selected.repartition(nparts, "url_canon")
                .withColumn("partition_id", F.spark_partition_id())
                .persist()
            )
            scheduled = selected
            for hook in self.request_hooks:
                scheduled = hook(scheduled)
            if cfg.store_cookies and self._cookie_jar:
                # jar applies after middleware, like the reference's
                # HTTP-client-level jar; an existing `cookie` header is
                # replaced, other headers pass through untouched
                jar = F.broadcast(
                    self.spark.createDataFrame(
                        sorted(self._cookie_jar.items()),
                        "host string, _cookie string",
                    )
                )
                no_cookie = F.map_filter(
                    F.coalesce(
                        F.col("headers"),
                        F.create_map().cast("map<string,string>"),
                    ),
                    lambda k, _: k != "cookie",
                )
                scheduled = (
                    scheduled.join(jar, "host", "left")
                    .withColumn(
                        "headers",
                        F.when(
                            F.col("_cookie").isNotNull(),
                            F.map_concat(
                                no_cookie,
                                F.create_map(F.lit("cookie"), F.col("_cookie")),
                            ),
                        ).otherwise(F.col("headers")),
                    )
                    .drop("_cookie")
                )
            # order/items are INDEPENDENT sinks: submit them on the I/O
            # pool so they overlap the wave's compute (the driver-serial
            # turnaround between actions was measured as the 2v8 scaling
            # drag once parse got fast — docs/SCALE.md #17). Futures are
            # drained before this wave's unpersist sweep, so every
            # overlapped write reads live caches; manifest commits only
            # happen after the drain.
            wave_writes = [
                io_pool.submit(
                    io.write,
                    # wave is the PARTITION DIRECTORY (order/wave=N),
                    # not a data column. host + spider_id + fetch_ts
                    # make this sink the fetch HISTORY the continuous-
                    # crawl freshness tick reads (recrawl_due); the
                    # per-wave timestamp literal costs one plan
                    # compile per wave (~ms), accepted for a
                    # clock-injectable, deterministic history.
                    scheduled.select(
                        "seq", "url_canon", "host", "spider_id"
                    ).withColumn(
                        "fetch_ts", F.lit(self._now()).cast("timestamp")
                    ),
                    "order",
                    wave,
                )
            ]
            tr.mark("schedule+order")

            # fetch + parse (S3/D1-D5, P1-P9): the corpus join output
            # (html bytes included) is consumed by EXACTLY ONE Arrow
            # pass — acceptance, retry lineage, parsing, and outlink
            # canonicalization all happen inside it (see parse.py).
            # Nothing holding binary columns is ever persisted: the
            # InMemoryRelation -> Arrow path measured ~10x slower than
            # the live join.
            t0 = time.monotonic()
            if cfg.fetch_strategy == "http":
                # live pooled-HTTP fetch (fetch.http_fetch_stage): same
                # column contract, no pages table needed
                responses = http_fetch_stage(scheduled, cfg)
            else:
                responses = fetch_from_corpus(
                    scheduled, self._prepared_pages(), self.redirects,
                    strategy=cfg.fetch_strategy,
                    corpus_urls=self._prepared_page_urls(),
                )
            for hook in self.response_hooks:
                responses = hook(responses)
            parse_out = parse_responses(responses, self.spiders, cfg).persist()

            # metrics first: the ONE aggregation pass materializes
            # parse_out (the wave's heavy job) and yields every counter
            # the rest of the wave needs. Rows are buffered driver-side
            # (tiny — one per partition) and flushed at commits.
            # ONE collect serves both the per-partition metrics rows and
            # the M2 status histogram (monitor Status Codes pane,
            # tui.rs:103-117): the agg runs at (partition, status) grain
            # and rolls up driver-side — one fewer job in the wave's
            # serial budget (metrics.wave_metrics_fine docstring)
            # heavy-job AQE only when the wave is big enough for
            # runtime skew handling to repay the re-optimization
            # rounds (cfg.aqe_min_pending; small waves measured ~1.4s
            # flat per AQE'd action, pure serial floor)
            big_wave = (pending_count or 0) >= cfg.aqe_min_pending
            _aqe(big_wave)
            fine = wave_metrics_fine(parse_out).collect()
            if big_wave:
                _aqe(False)  # back to tiny bookkeeping actions
            mrows, status_counts, ps_bounds = rollup_wave_metrics(
                fine, wave, 0, 0.0, 0.0
            )
            self._status_buf.extend(
                {"wave": wave, "resp_status": s, "count": c}
                for s, c in sorted(status_counts.items())
            )
            t_fp_ms = (time.monotonic() - t0) * 1000  # fetch+parse wall
            n_sched = sum(r["scheduled"] for r in mrows)
            n_failed = sum(r["failed"] for r in mrows)
            n_retried = sum(r["retried"] for r in mrows)
            n_outlinks = sum(r["outlinks"] for r in mrows)
            tr.mark("fetch+parse+metrics")

            if cfg.store_cookies:
                self._harvest_cookies(parse_out)

            # items -> pipelines -> sink (I1-I5, S4)
            items = (
                parse_out.filter(F.col("kind") == "item")
                .select(
                    "item_type", "spider_id", "src_url", "title", "author",
                    "number", "text",
                )
            )
            n_unrouted = 0
            if self.pipelines is not None:
                items, unrouted = self.pipelines.process(items)
                # M7 pipeline counter (manager.rs:96-98): items whose
                # item_type has no chain are counted, not silently lost
                n_unrouted = unrouted.count()
            wave_writes.append(io_pool.submit(io.write, items, "items", wave))
            tr.mark("items")

            # outlinks (already canonicalized in-pass) -> self-dedup ->
            # seen anti-join -> seq extension -> frontier append.
            candidates = prepare_candidates(
                parse_out.filter(F.col("kind") == "request").select(
                    "spider_id", "parent_seq", "link_index", "out_url",
                    "url_canon", "host",
                ),
                dedup=cfg.dedup,
            )
            candidates = robots_disallow_filter(
                candidates, self.robots if cfg.respect_robots else None
            )
            if cfg.dedup:
                # first point this wave that needs the seen set: await
                # the overlapped write+build, then list the table dirs
                _await_seen()
                tr.mark("await-seen")
                # next_seq == unique urls enqueued so far == seen rows
                candidates = self._filter_new(
                    candidates,
                    io.read_all_waves("seen"),
                    seen_rows=next_seq,
                    wave_outlinks=n_outlinks,
                )
            new_front, n_new = enqueue_outlinks(
                candidates, next_seq, bounds=ps_bounds
            )
            tr.mark("enqueue(seq-jobs)")

            # retry rows: rejoin the small retryable key set against the
            # cached scheduled frontier (never against the corpus).
            if n_retried > 0:
                retry_keys = parse_out.filter(
                    (F.col("kind") == "resp") & F.col("retryable")
                ).select(F.col("parent_seq").alias("seq"))
                retry = (
                    scheduled.join(F.broadcast(retry_keys), "seq")
                    .select(*_FRONTIER_COLS)
                    .withColumn("attempt", F.col("attempt") + 1)
                )
            else:
                retry = new_front.limit(0)

            # DELTA-ONLY frontier write: only retry+new rows land in the
            # wave's segment — the deferred backlog is never rewritten
            # (merge-on-read; per-wave write volume is O(wave), see
            # stats.wave_frontier_rows). Fast path: n_sched equal to
            # pending_count means politeness scheduled everything and no
            # hook dropped rows, so this delta IS the whole pending set
            # and the segment/consumed state resets for free.
            #
            # The ENTIRE durable tail — frontier segment write, seen
            # delta write, bloom/cuckoo slice build — is ONE chained
            # task on the I/O pool: it overlaps the next wave's
            # schedule + fetch + parse. frontier_done gates readers of
            # the segment DIRECTORY (pending_view/admission/compaction);
            # _await_seen() (the full future) gates seen-set consumers
            # and releases this wave's caches.
            # localCheckpoint (non-eager), NOT plain persist: persist
            # caches DATA but keeps the full logical plan, and the
            # handoff below would nest every previous wave's plan into
            # the next one (select_wave references pending several
            # times, so the tree grows ~4x per wave — measured as a
            # planning-time explosion by wave 3). The checkpoint
            # truncates lineage to a LogicalRDD scan, materialized for
            # free by the tail task's frontier write. On a cluster the
            # blocks are unreplicated — executor loss fails the wave —
            # but the parquet segment the tail wrote is the durable
            # copy, and a resume from the manifest replays cleanly.
            front_next = retry.unionByName(new_front).localCheckpoint(
                eager=False
            )
            do_seen = bool(cfg.dedup and n_new)
            frontier_done = threading.Event()

            def _tail(
                w: int = wave,
                fn: DataFrame = front_next,
                ev: threading.Event = frontier_done,
                do_seen: bool = do_seen,
            ) -> None:
                try:
                    io.write(fn, "frontier", w + 1)
                finally:
                    ev.set()  # never leave a reader blocked
                if do_seen:
                    # new rows are exactly the attempt==0 rows (retries
                    # have attempt >= 1); literal-free filter
                    io.write(
                        fn.filter(F.col("attempt") == 0).select("url_canon"),
                        "seen", w + 1,
                    )
                    # build the delta slice from the url-only seen
                    # parquet just written — a fraction of the frontier
                    # dir's bytes
                    self._bloom_add(io.read("seen", w + 1))

            # caches the tail task reads — released once it lands. The
            # PREVIOUS wave's front_next is released one wave later (the
            # handoff plan below may reference it as `pending`).
            tail_release = [
                selected, parse_out, *drain_seq_caches(), *self._wave_caches
            ]
            self._wave_caches = []
            if prev_front is not None:
                tail_release.append(prev_front)
            prev_front = front_next
            _await_seen()  # no-op unless dedup=False skipped the await
            if cfg.overlap_tail:
                seen_fut = io_pool.submit(_tail)
                release_after_seen = tail_release
            else:  # ablation: synchronous tail at the wave boundary
                _tail()
                for df in tail_release:
                    df.unpersist()
            tr.mark("tail(submit)")

            if n_sched == pending_count:
                segments = [f"frontier/wave={wave + 1}"]
                consumed = []
                consumed_rows = 0
                # DataFrame handoff: the new segment IS the whole next
                # pending set, and front_next is its live cached frame —
                # the next wave plans against it directly instead of
                # waiting for the parquet read-back. Only on the plain
                # path (no staged seeds/hooks mutating pending outside
                # the frame), and lineage-reset every few waves so the
                # logical plan tree stays bounded on long crawls.
                handoff_streak += 1
                if (
                    cfg.pending_handoff
                    and not staged_seeds
                    and not self.request_hooks
                    and handoff_streak % 8 != 0
                ):
                    pending_handoff = front_next
                else:
                    pending_handoff = None
            else:
                pending_handoff = None
                handoff_streak = 0
                segments = segments + [f"frontier/wave={wave + 1}"]
                # tombstones: the PRE-hook scheduled keys leave pending
                # (a hook-dropped request is consumed, never retried).
                # Overlapped like the other independent sinks; the next
                # pending_view read happens after the wave-end drain.
                wave_writes.append(
                    io_pool.submit(
                        io.write, selected.select("seq", "attempt"),
                        "consumed", wave,
                    )
                )
                consumed = consumed + [f"consumed/wave={wave}"]
                consumed_rows += n_sched
                pending_next = max(pending_count - n_sched + n_retried + n_new, 1)
                if (
                    len(segments) > cfg.frontier_max_segments
                    or consumed_rows > 2 * pending_next
                ):
                    # amortized compaction (Iceberg rewrite-data-files
                    # analog): materialize the true pending set as ONE
                    # base segment, drop the tombstones. O(backlog), but
                    # triggered only when tombstones dominate or the
                    # segment list grows — O(1) amortized per row.
                    # pending_view reads the consumed tombstones written
                    # above: drain the overlapped writes first.
                    for fut in wave_writes:
                        fut.result()
                    wave_writes = []
                    frontier_done.wait()  # segment dir must be complete
                    base_rel = f"frontier_base/wave={wave + 1}"
                    io.write_rel(pending_view(), base_rel)
                    segments = [base_rel]
                    consumed = []
                    consumed_rows = 0
            tr.mark("dedup+seq+frontier")
            next_seq += n_new

            n_dedup = max(n_outlinks - n_new, 0)
            for r in mrows:
                if r["partition_id"] == -1:
                    r["deduped"] = n_dedup
                    r["unrouted"] = n_unrouted
                r["t_fetch_ms"] = t_fp_ms
            self._metrics_buf.extend(mrows)
            stats.scheduled += n_sched
            stats.fetched += sum(r["fetched"] for r in mrows)
            stats.failed += n_failed
            stats.items += sum(r["items"] for r in mrows)
            stats.outlinks += n_outlinks
            stats.deduped += n_dedup
            stats.unrouted += n_unrouted
            stats.dropped += sum(r["dropped"] for r in mrows)
            stats.exhausted += n_failed - n_retried
            if self.request_hooks:
                # a request hook may have dropped scheduled rows AFTER
                # select_wave counted them against pending; the
                # arithmetic below would overcount pending forever
                # (blocking idle shutdown + staged-seed admission), so
                # re-probe the materialized frontier next wave instead.
                pending_count = None
            else:
                pending_count = pending_count - n_sched + n_retried + n_new
            if cfg.track_spiders:
                # pending_view reads this wave's consumed tombstones
                # AND the new frontier segment: drain the overlapped
                # writes and the tail's frontier stage first
                for fut in wave_writes:
                    fut.result()
                frontier_done.wait()
                nxt = pending_view()
                spider_pending = {
                    int(r["spider_id"]): r["cnt"]
                    for r in nxt.groupBy("spider_id").agg(
                        F.count("*").alias("cnt")
                    ).collect()
                }
                for sid, sp in self.spiders.items():
                    if (
                        sid not in closed_spiders
                        and spider_pending.get(sid, 0) == 0
                    ):
                        sp.close()  # deactivation (manager.rs:340-369)
                        closed_spiders.add(sid)
                stats.closed_spiders = len(closed_spiders)

            stats.wave_walls.append(time.monotonic() - t_wave)
            stats.wave_scheduled.append(n_sched)
            stats.wave_new.append(n_new)
            stats.wave_outlinks.append(n_outlinks)
            # lineage evidence that frontier writes are O(wave), not
            # O(backlog): rows written to the wave's delta segment
            stats.wave_frontier_rows.append(n_retried + n_new)
            stats.wave_seen_join.append(
                getattr(self, "_last_seen_join", None)
            )

            # drain overlapped sink writes BEFORE any commit (a manifest
            # must never point past unwritten data) and before the
            # unpersist sweep (the writes read this wave's caches)
            for fut in wave_writes:
                fut.result()

            wave += 1
            stats.waves = wave
            if wave % cfg.checkpoint_every == 0:
                # a manifest advancing next_wave implies the wave's seen
                # slice is durable — await the overlapped write+build
                _await_seen()
                self._flush_metrics(io)
                io.commit(
                    {
                        "next_wave": wave,
                        "next_seq": int(next_seq),
                        "deduped": int(stats.deduped),
                        "segments": segments,
                        "consumed": consumed,
                        "consumed_rows": consumed_rows,
                    }
                )
            # NOTE: this wave's caches are NOT swept here — the tail
            # task still reads them; _await_seen() releases them when
            # the tail lands (at the next wave's dedup point or below)

        _await_seen()  # terminal wave's overlapped tail, if any
        for df in (*drain_seq_caches(), *self._wave_caches):
            df.unpersist()  # caches from injections on terminal waves
        self._wave_caches = []
        if prev_front is not None:
            prev_front.unpersist()  # last wave's handoff frame
        for sid, sp in self.spiders.items():
            if not cfg.track_spiders or sid not in closed_spiders:
                sp.close()  # forced close at shutdown (manager.rs:208-237)
        if self.pipelines is not None:
            # I5 drain + close: pipelines close after spiders, once the
            # final wave's items are written (manager.rs:105-150)
            self.pipelines.close_all()
        self._flush_metrics(io)
        io.commit(
            {
                "next_wave": wave,
                "next_seq": int(next_seq),
                "deduped": int(stats.deduped),
                "segments": segments,
                "consumed": consumed,
                "consumed_rows": consumed_rows,
                "done": True,
            }
        )
        io_pool.shutdown(wait=True)
        _aqe(True)  # restore the session's adaptive setting
        _restore_mpb()
        stats.wall_s = time.monotonic() - t_start
        return stats

    def _harvest_cookies(self, parse_out: DataFrame) -> list:
        """Fold Set-Cookie lineage into the per-host jar (S6 harvest,
        reference engine.rs cookie store). The reduction happens
        EXECUTOR-side — the driver receives O(distinct hosts), not
        O(cookie-bearing responses): per host, the lexicographically
        largest set_cookie value wins (deterministic; NOT crawl order —
        the same tie-break the previous sorted()-loop applied).
        Returns the collected rows (one per distinct cookie host)."""
        jar_rows = (
            parse_out.filter(
                (F.col("kind") == "resp") & F.col("set_cookie").isNotNull()
            )
            .groupBy("host")
            .agg(F.max("set_cookie").alias("set_cookie"))
            .collect()
        )
        for r in jar_rows:
            self._cookie_jar[r["host"]] = r["set_cookie"]
        return jar_rows

    def _flush_metrics(self, io: TableIO) -> None:
        """Write all buffered (wave, partition) metric rows as one table."""
        if not self._metrics_buf:
            return
        import pandas as pd

        from ironspark.schemas import METRICS_SCHEMA

        pdf = pd.DataFrame(self._metrics_buf)[[f.name for f in METRICS_SCHEMA.fields]]
        df = self.spark.createDataFrame(pdf, METRICS_SCHEMA)
        # through the TableIO abstraction, NOT direct parquet: resume
        # (io.exists/io.read above) and monitor.render_run go through the
        # backend — a direct-parquet flush would be invisible to the
        # Iceberg backend's catalog-based exists()
        io.write(df.coalesce(1), "metrics")
        if self._status_buf:
            sdf = self.spark.createDataFrame(
                pd.DataFrame(self._status_buf),
                "wave int, resp_status int, count long",
            )
            io.write(sdf.coalesce(1), "status")

    # -- result accessors ------------------------------------------------------

    def items_df(self, run_dir: str) -> DataFrame | None:
        return make_table_io(self.spark, run_dir).read_all_waves("items")

    def crawl_order_df(self, run_dir: str) -> DataFrame | None:
        return make_table_io(self.spark, run_dir).read_all_waves("order")

    def metrics_df(self, run_dir: str) -> DataFrame | None:
        io = make_table_io(self.spark, run_dir)
        if not io.exists("metrics"):
            return None
        return io.read("metrics")

    def seen_df(self, run_dir: str) -> DataFrame:
        return make_table_io(self.spark, run_dir).read("seen")
