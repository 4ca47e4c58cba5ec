"""Durable catalog for the engine's incremental stores.

The incremental trilogy (q296's LSH signature store, q303's IVF index,
q311's component labels, q324's fingerprint store) proved the
monthly-drop laws against per-query temp directories; this module is
the production shape those laws run against: **named, persisted,
schema'd assets** that successive drops reuse, mirroring the
reference's folder-per-month staging contract (reference:
src/etl/load.py:56-62 — one folder per arriving month, history never
rewritten).

Layout — one directory per named store under a catalog root::

    <root>/<name>/
        MANIFEST.json          clustering keys, schema, per-drop rows,
                               total rows, last-drop watermark
        data/drop=<label>/     parquet, range-clustered on the keys

Contract:

* **A drop is the unit of arrival.** ``write_drop`` writes exactly one
  ``drop=<label>`` partition; re-writing the same label is an
  idempotent replace (the reference's per-month reload semantics);
  other drops are never touched. At 100 TB this is what makes the
  monthly load O(drop), not O(corpus).
* **Range-clustered within each drop** on the store's clustering keys
  (``write_sorted_parquet``), so parquet min/max statistics keep probe
  joins pruning to the few files a key range touches even as drops
  accumulate — the (band, sig) store probe reads ~1 file per band per
  drop, not the store.
* **The manifest is the operational record**: clustering keys (probe
  joins must match them), the schema, per-drop and total row counts,
  and ``last_drop_watermark`` — the label of the newest drop, which a
  scheduler compares against the arrival feed to decide what to load
  next. Written atomically (tmp + rename) so a crashed load never
  leaves a half-manifest.
* **Schema and clustering are pinned at creation**: a drop whose
  schema or keys disagree with the manifest is refused loudly rather
  than silently forked.

Hermeticity: gated queries root their catalog at
:func:`session_catalog` — ``$OWL_ETL_STORE_ROOT`` if set (the
deployment shape: a warehouse path), else one per-process temp root
created lazily and removed at exit, so stores survive across queries
within a run but never leak state between runs or scale factors
(store names carry an sf tag for the latter).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from owl_etl_spark.sources.writers import write_sorted_parquet

_LABEL_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9._-]*$")

#: reserved partition-directory column; store frames must not carry it
DROP_COL = "drop"


class StoreCatalog:
    """A root directory owning any number of named incremental stores."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- paths -----------------------------------------------------------
    def store_path(self, name: str) -> str:
        if not _LABEL_RE.match(name):
            raise ValueError(f"invalid store name {name!r}")
        return os.path.join(self.root, name)

    def _data_path(self, name: str) -> str:
        return os.path.join(self.store_path(name), "data")

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self.store_path(name), "MANIFEST.json")

    # -- manifest --------------------------------------------------------
    def exists(self, name: str) -> bool:
        return os.path.exists(self._manifest_path(name))

    def manifest(self, name: str) -> dict:
        with open(self._manifest_path(name)) as fh:
            return json.load(fh)

    def _write_manifest(self, name: str, manifest: dict) -> None:
        path = self._manifest_path(name)
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=2, sort_keys=True)
        os.replace(tmp, path)

    def drops(self, name: str) -> list[str]:
        """Drop labels in arrival (write) order."""
        return [d["label"] for d in self.manifest(name)["drops"]]

    def watermark(self, name: str) -> str | None:
        """Label of the newest loaded drop, or None for an empty store."""
        return self.manifest(name)["last_drop_watermark"] if self.exists(name) else None

    def reset(self, name: str) -> None:
        """Delete a store entirely (data + manifest). Used by replay
        tests and by backfills that rebuild a store from scratch."""
        shutil.rmtree(self.store_path(name), ignore_errors=True)

    # -- write -----------------------------------------------------------
    def write_drop(
        self,
        df: DataFrame,
        name: str,
        clustering_keys: list[str],
        drop_label: str,
        target_partitions: int | None = None,
    ) -> dict:
        """Load one arriving drop into ``name`` and return the updated
        manifest. Idempotent per label (same-label rewrite replaces
        that drop only); refuses schema or clustering-key drift."""
        if not _LABEL_RE.match(drop_label):
            raise ValueError(f"invalid drop label {drop_label!r}")
        if drop_label.endswith(("__compact_tmp", "__compact_old")):
            raise ValueError(
                f"drop label {drop_label!r} ends with a reserved compaction "
                "suffix — crash recovery would treat the drop as a mid-swap "
                "leftover and rename or delete it"
            )
        if DROP_COL in df.columns:
            raise ValueError(
                f"store frames must not carry a {DROP_COL!r} column; "
                "it is the catalog's partition directory"
            )
        missing = [k for k in clustering_keys if k not in df.columns]
        if missing:
            raise ValueError(f"clustering keys {missing} not in frame columns {df.columns}")

        schema_str = df.schema.simpleString()
        if self.exists(name):
            manifest = self.manifest(name)
            if manifest["clustering_keys"] != list(clustering_keys):
                raise ValueError(
                    f"store {name!r} is clustered on {manifest['clustering_keys']}; "
                    f"refusing a drop clustered on {list(clustering_keys)}"
                )
            if manifest["schema"] != schema_str:
                raise ValueError(
                    f"store {name!r} schema drift: manifest has "
                    f"{manifest['schema']}, drop has {schema_str}"
                )
        else:
            manifest = {
                "name": name,
                "clustering_keys": list(clustering_keys),
                "schema": schema_str,
                "drops": [],
                "row_count": 0,
                "last_drop_watermark": None,
            }

        self._recover_crashed_compactions(name)
        drop_dir = os.path.join(self._data_path(name), f"{DROP_COL}={drop_label}")
        write_sorted_parquet(df, drop_dir, list(clustering_keys), target_partitions)
        # metadata-only count of what actually landed (parquet footers)
        rows = df.sparkSession.read.parquet(drop_dir).count()

        manifest["drops"] = [d for d in manifest["drops"] if d["label"] != drop_label]
        manifest["drops"].append({"label": drop_label, "rows": rows})
        manifest["row_count"] = sum(d["rows"] for d in manifest["drops"])
        manifest["last_drop_watermark"] = drop_label
        self._write_manifest(name, manifest)
        return manifest

    def compact_drop(
        self,
        spark: SparkSession,
        name: str,
        drop_label: str,
        target_file_bytes: int = 128 * 1024 * 1024,
    ) -> int:
        """Monthly hygiene: rewrite one drop into
        ``ceil(bytes/target)`` files WITHOUT losing its range
        clustering (a plain coalesce — writers.compact_parquet —
        would merge unsorted neighbors and destroy the min/max file
        pruning the store exists for). Read → re-cluster on the
        manifest's keys at the reduced partition count → crash-safe
        swap; row count re-verified against the manifest before the
        swap. Returns the new file count.

        Crash safety (round 11 — the original delete-then-rename swap
        had a window where a kill left NEITHER directory and the next
        whole-store read silently missed the drop): the swap never
        destroys data before its replacement is live —

            write <drop>__compact_tmp        (crash: tmp garbage, drop intact)
            rename <drop>  -> <drop>__compact_old   (crash: old holds the data)
            rename tmp     -> <drop>                (crash: both exist)
            delete <drop>__compact_old

        and every catalog entry point runs
        :meth:`_recover_crashed_compactions` first, which rolls the
        store back/forward to a consistent state from any of those
        leftovers."""
        import math

        self._recover_crashed_compactions(name)
        manifest = self.manifest(name)
        keys = manifest["clustering_keys"]
        drop_dir = os.path.join(self._data_path(name), f"{DROP_COL}={drop_label}")
        expected = next(
            d["rows"] for d in manifest["drops"] if d["label"] == drop_label
        )
        total = sum(
            e.stat().st_size
            for e in os.scandir(drop_dir)
            if e.name.endswith(".parquet")
        )
        n = max(1, math.ceil(total / target_file_bytes))
        tmp = drop_dir.rstrip("/") + "__compact_tmp"
        write_sorted_parquet(spark.read.parquet(drop_dir), tmp, keys, n)
        got = spark.read.parquet(tmp).count()
        if got != expected:
            shutil.rmtree(tmp, ignore_errors=True)
            raise RuntimeError(
                f"compaction of {name}/{drop_label} produced {got} rows, "
                f"manifest says {expected}; drop left untouched"
            )
        old = drop_dir.rstrip("/") + "__compact_old"
        os.rename(drop_dir, old)  # the data survives every crash point
        os.rename(tmp, drop_dir)
        shutil.rmtree(old, ignore_errors=True)
        return n

    def _recover_crashed_compactions(self, name: str) -> None:
        """Repair leftovers of a ``compact_drop`` killed mid-swap so
        readers never see a half-swapped store (a ``__compact_tmp`` /
        ``__compact_old`` sibling would otherwise also poison the
        whole-store partition-discovery read):

        - ``<drop>__compact_old`` with ``<drop>`` missing — killed
          between the two renames: roll BACK (the old directory is the
          authoritative data; the tmp rewrite is discarded).
        - ``<drop>__compact_old`` with ``<drop>`` present — killed
          after the swap, before cleanup: roll FORWARD (drop the old
          copy; the compacted directory is live and verified).
        - ``<drop>__compact_tmp`` — an uncommitted rewrite: discard.

        O(drops) directory listing, no data reads — cheap enough to
        run on every catalog entry point.

        Concurrency contract: catalog MAINTENANCE (write_drop /
        compact_drop / this recovery) assumes ONE maintainer process
        at a time — the reference's monthly-cadence loader shape. A
        concurrent maintainer's live tmp/old directories are
        indistinguishable from crash leftovers, so recovery would
        sabotage its swap; coordinate multi-writer deployments
        externally (scheduler lease / advisory lock). Plain parquet
        READERS outside the catalog are unaffected except during the
        instant of the swap renames."""
        data = self._data_path(name)
        if not os.path.isdir(data):
            return
        for entry in sorted(os.listdir(data)):
            path = os.path.join(data, entry)
            if entry.endswith("__compact_old"):
                final = path[: -len("__compact_old")]
                if not os.path.exists(final):
                    os.rename(path, final)
                else:
                    shutil.rmtree(path, ignore_errors=True)
            elif entry.endswith("__compact_tmp"):
                shutil.rmtree(path, ignore_errors=True)

    # -- read ------------------------------------------------------------
    def read(self, spark: SparkSession, name: str, with_drop: bool = False) -> DataFrame:
        """The whole store (every drop unioned). ``with_drop=True``
        keeps the drop label as a string column — the partition-pruned
        handle for drop-scoped reprocessing."""
        if not self.exists(name):
            raise FileNotFoundError(f"store {name!r} does not exist under {self.root}")
        self._recover_crashed_compactions(name)
        data = self._data_path(name)
        df = spark.read.option("basePath", data).parquet(data)
        if with_drop:
            return df.withColumn(DROP_COL, F.col(DROP_COL).cast("string"))
        return df.drop(DROP_COL)

    def read_drop(self, spark: SparkSession, name: str, drop_label: str) -> DataFrame:
        """One drop — a direct partition-directory read (no listing of
        the other drops at all)."""
        self._recover_crashed_compactions(name)
        drop_dir = os.path.join(self._data_path(name), f"{DROP_COL}={drop_label}")
        return spark.read.parquet(drop_dir)


# ---------------------------------------------------------------------------
# per-process default catalog (hermetic stand-in for a warehouse root)
# ---------------------------------------------------------------------------

_SESSION_CATALOG: StoreCatalog | None = None


def session_catalog() -> StoreCatalog:
    """The process-wide catalog gated queries share: rooted at
    ``$OWL_ETL_STORE_ROOT`` when a deployment sets one, else a lazily
    created per-process temp root removed at interpreter exit. Stores
    written by one query are readable by later queries in the same
    run; nothing leaks between runs."""
    global _SESSION_CATALOG
    if _SESSION_CATALOG is None:
        root = os.environ.get("OWL_ETL_STORE_ROOT")
        if root:
            _SESSION_CATALOG = StoreCatalog(root)
        else:
            import atexit

            tmp = tempfile.mkdtemp(prefix="owl_etl_stores_")
            atexit.register(shutil.rmtree, tmp, True)
            _SESSION_CATALOG = StoreCatalog(tmp)
    return _SESSION_CATALOG


def sf_tag(sf_dir: str) -> str:
    """Store-name suffix isolating scale factors (and any other input
    root) from each other inside one process-wide catalog."""
    return re.sub(r"[^A-Za-z0-9._-]", "_", os.path.abspath(sf_dir)).strip("_")
