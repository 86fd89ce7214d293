"""``lake`` — the table itself as a PySpark Python Data Source.

Makes the snapshot lake a FIRST-CLASS Spark format, SQL-composable with
no engine imports on the query side::

    spark.dataSource.register(LakeDataSource)
    df = spark.read.format("lake").option("path", table_path).load()
    df.createOrReplaceTempView("pages")
    spark.sql("SELECT lang, count(*) FROM pages GROUP BY lang")

Options (all metadata-resolved at planning time, no Spark job):

- ``path``           table root (required)
- ``versionAsOf``    int snapshot version, or a named ref (tag/branch) or
                     staged WAP token — anything :meth:`LakeTable.manifest`
                     accepts
- ``timestampAsOf``  ISO-8601 datetime or unix seconds — resolved via
                     :meth:`LakeTable.version_as_of`

Semantics: exactly ``LakeTable.read(version)`` — tombstones hidden,
internal columns hidden, merge-on-read deltas LWW-folded, column
renames/drops/re-adds resolved by field id per file epoch, Iceberg-v3
initial defaults filled (the complement of the ``lake_cdf`` source,
which streams the table's CHANGES; this reads its STATE).

Filter pushdown (Spark 4.1 ``pushFilters``): the source consumes
predicates for PLANNING-TIME FILE PRUNING only and returns every filter
back to Spark for residual evaluation — pruning can therefore only ever
skip files, never change results (the same posture as parquet row-group
skipping). Three tiers mirror the engine's own read paths:

- key equality / IN  → bucket-hash prune (``pmod(xxhash64(key), n)`` per
  file's own spec — exact across spec evolution), manifest key min/max,
  z-order ``__key_hash__`` bounds, and per-file bloom filters: the
  ``lookup`` path (lake/table.py:3718) expressed through a Spark scan.
- ``warc_ts`` range  → manifest-stats pruning with the MOR-safe rules of
  ``scan_file_plan`` (lake/table.py:591): a lower bound prunes any file,
  an upper bound only files no surviving delta could supersede.
- everything else    → returned untouched.

Residual-filter soundness of the fold (why pruning + per-group LWW still
agrees with global LWW): under ``(warc_ts, lsn)`` rank order a
superseding row never has a LOWER ``warc_ts`` than the row it replaces,
so every file a time bound prunes holds only rows that are BOTH
out-of-range and outranked by any surviving in-range version — whatever
a partially-pruned fold emits for such keys is itself out-of-range and
dies on Spark's residual predicate. Key pruning keeps every file that
could contain a probed key (bloom/min-max never false-prune), so probed
keys fold over their complete version set; unprobed keys are dropped by
the residual equality. Pinned by tests against unpruned reads.

Scale: planning is O(files) driver-side JSON work against the manifest
column stats (the Iceberg model — no footer opens for stats-bearing
manifests); each surviving base-only file becomes one input partition
(task granularity = file, like any parquet scan), and merge-on-read
bucket classes fold as one partition per connected class group — the
same co-location invariant ``changes_between`` plans by. Workers read
only their files with pyarrow and emit Arrow RecordBatches (vectorized
end-to-end; no per-row Python).

Reference analogue: ad-hoc BigQuery SQL over the tick tables
(/root/reference/README.md:17, fintick/bqloader/base.py:60-88) — the
"query it like any table" face of the lake.
"""

from __future__ import annotations

import datetime as _dt
import os
from typing import Any, Iterator

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualNullSafe,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    StringStartsWith,
)

from .cdf_source import _coerce_default, _table
from .xxh64 import SPARK_SEED, spark_xxhash64


from .strstat import prefix_successor as _prefix_upper


def _prefix_range_hits(prefixes: list[str], mn, mx) -> bool:
    """Could a [mn, mx] string range contain a key matching EVERY pushed
    prefix? Conjunctive (Spark pushes conjuncts): one miss prunes. A
    non-string bound cannot prune (unknown collation vs Spark's)."""
    if not isinstance(mn, str) or not isinstance(mx, str):
        return True
    for p in prefixes:
        up = _prefix_upper(p)
        if mx < p or (up is not None and mn >= up):
            return False
    return True


def _norm_stat_probe(v: Any) -> Any:
    """Filter value → the manifest-stats encoding. Delegates temporal
    values to the WRITE side's encoder (`LakeTable._json_stat`) so probe
    and manifest can never drift apart."""
    if isinstance(v, (_dt.datetime, _dt.date)):
        from .table import LakeTable

        return LakeTable._json_stat(v)
    return v


def _cmp_ok(a: Any, b: Any) -> bool:
    """Can a filter value be ordered against a JSON stat bound? Strings
    with strings, real numbers with real numbers — a mismatch (or bool
    vs number: Spark would not push it on a bool column anyway) keeps
    the file."""
    if isinstance(a, str) and isinstance(b, str):
        return True
    num = (int, float)
    return (
        isinstance(a, num) and isinstance(b, num)
        and not isinstance(a, bool) and not isinstance(b, bool)
    )


def _stat_excludes(lo: Any, hi: Any, op: str, val: Any) -> bool:
    """True iff a file whose column spans [lo, hi] provably holds NO row
    satisfying `col <op> val`. Conservative: any doubt keeps the file.

    NaN blind spot (Spark orders NaN ABOVE every number, parquet min/max
    statistics do not see NaN at all): on float bounds a hidden NaN row
    satisfies ``> v`` / ``>= v`` for ANY v, so gt/ge must never exclude a
    float-statted file. The other ops stay sound — NaN satisfies none of
    eq/in (probe non-NaN; a NaN probe compares False everywhere and
    keeps the file) nor lt/le (NaN is the maximum)."""
    if op == "sw":
        return isinstance(val, str) and not _prefix_range_hits([val], lo, hi)
    if op == "in":
        probes = [_norm_stat_probe(v) for v in val]
        if not all(_cmp_ok(p, lo) for p in probes):
            return False
        return all(p < lo or p > hi for p in probes)
    v = _norm_stat_probe(val)
    if not _cmp_ok(v, lo):
        return False
    if op == "eq":
        return v < lo or v > hi
    if op == "gt" or op == "ge":
        if isinstance(lo, float) or isinstance(hi, float):
            return False  # stats-invisible NaN could satisfy the filter
        return hi <= v if op == "gt" else hi < v
    if op == "lt":
        return lo >= v
    if op == "le":
        return lo > v
    return False


def _resolve_version(t, options: dict) -> int | str | None:
    """Pin the snapshot the whole query reads (schema + partitions).

    ``LakeDataSource`` resolves ONCE per query and stashes the result
    under ``__pinnedVersion`` so schema and scan always come from the
    same snapshot (a commit landing between the two calls must not split
    them — snapshot isolation within one query)."""
    pv = options.get("__pinnedVersion")
    if pv is not None:
        return pv
    v = options.get("versionAsOf", options.get("versionasof"))
    ts = options.get("timestampAsOf", options.get("timestampasof"))
    if v is not None and ts is not None:
        raise ValueError("versionAsOf and timestampAsOf are mutually exclusive")
    if v is not None:
        s = str(v)
        if not s.lstrip("-").isdigit():
            return s
        # mirror LakeTable.manifest's resolution order: a tag/branch (or
        # staged WAP token) named like '123' must reach that ref, not
        # silently read snapshot version 123
        if t._load_ref(s, missing_ok=True) is not None or os.path.exists(
            os.path.join(t.meta_dir, f"staged-{s}.json")
        ):
            return s
        return int(s)
    if ts is not None:
        try:
            when: _dt.datetime | float = float(ts)
        except ValueError:
            when = _dt.datetime.fromisoformat(str(ts))
        return t.version_as_of(when)
    cur = t.current_version()
    if cur is None:
        raise FileNotFoundError(f"no lake table at {t.path}")
    return cur


def lake_schema(options: dict) -> T.StructType:
    from .table import _INTERNAL_COLS

    t = _table(options["path"])
    m = t.manifest(_resolve_version(t, options))
    return T.StructType(
        [
            f
            for f in T.StructType.fromJson(m["schema"]).fields
            if f.name not in _INTERNAL_COLS
        ]
    )


class LakePartition(InputPartition):
    """One fold unit: either a single base file (``fold=False``) or every
    file of one connected merge-on-read bucket-class group. Self-contained
    — absolute paths with per-file column maps resolved by field id on
    the driver (same contract as ``CdfPartition``)."""

    def __init__(
        self,
        files: list[tuple[str, dict[str, str | None]]],
        fold: bool,
        key: str,
        order_cols: list[str],
        public_cols: list[str],
        defaults: dict[str, Any],
        key_values: list[Any] | None,
        ts_bounds: tuple[int | None, int | None] = (None, None),
        key_prefixes: list[str] | None = None,
        generic: list[tuple[str, str, Any]] | None = None,
    ):
        self.files = files
        self.fold = fold
        self.key = key
        self.order_cols = order_cols
        self.public_cols = public_cols
        self.defaults = defaults
        # pushed key-equality probe set: safe to pre-filter BEFORE the
        # fold (fold is per-key) — cuts the pandas working set to the
        # probed keys; ts bounds are NOT pre-applied on fold groups
        # (unsafe pre-fold; Spark's residual filter owns them) but ARE
        # applied on base-only partitions, where each row stands alone
        self.key_values = key_values
        self.ts_bounds = ts_bounds
        # pushed key-prefix (LIKE 'p%') conjuncts: per-key predicates, so
        # like key_values they are safe to pre-apply BEFORE the fold
        self.key_prefixes = key_prefixes or []
        # any-column conjuncts for worker-side row-group skipping; fold
        # groups keep only the key-column ones (payload-stats skipping
        # inside a fold could drop a key's superseding version)
        self.generic = generic or []


class LakeReader(DataSourceReader):
    def __init__(self, schema: T.StructType, options: dict):
        self.path = options["path"]
        self.schema = schema
        self.public_cols = [f.name for f in schema.fields]
        t = _table(self.path)
        self.version = _resolve_version(t, options)
        m = t.manifest(self.version)
        self._key = m["key"]
        self._defaults = {
            f.name: _coerce_default(v, f.dataType)
            for f in schema.fields
            if (v := (m.get("column_defaults") or {}).get(f.name)) is not None
        }
        self._key_values: list[Any] | None = None  # pushed equality probes
        self._key_prefixes: list[str] = []  # pushed StartsWith conjuncts
        self._ts_lo: int | None = None  # inclusive, unix micros
        self._ts_hi: int | None = None  # inclusive, unix micros
        # any-column predicates for the generic manifest-stats tier:
        # (column, op, value) conjuncts
        self._generic: list[tuple[str, str, Any]] = []

    # ------------------------------------------------------- pushdown

    @staticmethod
    def _col(f) -> str | None:
        # attribute is a ColumnPath tuple; nested refs can't prune here
        cp = getattr(f, "attribute", ())
        return cp[0] if len(cp) == 1 else None

    def _to_micros(self, v: Any) -> int | None:
        if isinstance(v, _dt.datetime):
            if v.tzinfo is not None:
                v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
            return int(
                (v - _dt.datetime(1970, 1, 1)).total_seconds() * 1_000_000
            )
        return None

    @staticmethod
    def _generic_entry(f, col: str):
        """(col, op, value) conjunct for the any-column stats tier, or
        None when stats cannot speak to the predicate (nulls, unknown
        filter classes)."""
        if isinstance(f, (EqualTo, EqualNullSafe)):
            return (col, "eq", f.value) if f.value is not None else None
        if isinstance(f, In):
            vals = list(f.value)
            if vals and all(v is not None for v in vals):
                return (col, "in", vals)
            return None  # a null probe can match rows stats cannot see
        if isinstance(f, GreaterThan):
            return (col, "gt", f.value)
        if isinstance(f, GreaterThanOrEqual):
            return (col, "ge", f.value)
        if isinstance(f, LessThan):
            return (col, "lt", f.value)
        if isinstance(f, LessThanOrEqual):
            return (col, "le", f.value)
        if isinstance(f, StringStartsWith):
            return (col, "sw", str(f.value))
        if isinstance(f, IsNotNull):
            return (col, "nn", None)
        if isinstance(f, IsNull):
            return (col, "nu", None)
        return None

    def pushFilters(self, filters):  # noqa: N802 (Spark API name)
        for f in filters:
            col = self._col(f)
            handled = False
            if col == self._key and isinstance(f, (EqualTo, EqualNullSafe)):
                vals = [f.value]
                self._key_values = (
                    vals
                    if self._key_values is None
                    else [v for v in self._key_values if v in vals]
                )
                handled = True
            elif col == self._key and isinstance(f, In):
                vals = list(f.value)
                self._key_values = (
                    vals
                    if self._key_values is None
                    else [v for v in self._key_values if v in vals]
                )
                handled = True
            elif col == self._key and isinstance(f, StringStartsWith):
                self._key_prefixes.append(str(f.value))
                handled = True
            elif col == "warc_ts" and isinstance(
                f, (GreaterThan, GreaterThanOrEqual, EqualTo)
            ):
                mu = self._to_micros(f.value)
                if mu is not None:
                    lo = mu if not isinstance(f, GreaterThan) else mu + 1
                    self._ts_lo = lo if self._ts_lo is None else max(self._ts_lo, lo)
                    handled = True
            if col == "warc_ts" and isinstance(
                f, (LessThan, LessThanOrEqual, EqualTo)
            ):
                mu = self._to_micros(f.value)
                if mu is not None:
                    hi = mu if not isinstance(f, LessThan) else mu - 1
                    self._ts_hi = hi if self._ts_hi is None else min(self._ts_hi, hi)
                    handled = True
            if not handled and col is not None:
                ent = self._generic_entry(f, col)
                if ent is not None:
                    self._generic.append(ent)
        # pruning-only pushdown: Spark re-applies EVERY filter (residual),
        # so planner decisions can never change results
        return filters

    # ------------------------------------------------------- planning

    def _colmap(self, t, m: dict[str, Any], f: dict[str, Any]) -> dict[str, str | None]:
        """query-schema column -> physical name in file ``f`` (None =
        absent at that epoch: default/null-fill). Single-manifest twin of
        the CDF planner's cross-manifest map."""
        need = [*self.public_cols, "lsn", "is_deleted"]
        fids = m.get("field_ids")
        eps = m.get("schema_epochs")
        out: dict[str, str | None] = {}
        for col in need:
            fid = (fids or {}).get(col)
            if fid is None or eps is None:
                out[col] = col
            else:
                e = min(t._file_epoch(f), len(eps) - 1)
                out[col] = eps[e].get(str(fid))
        return out

    def _bloom_keep(self, m: dict[str, Any], files: list[dict]) -> list[dict]:
        """Bloom tier of the key prune — pyarrow read of the bloom side
        table (no SparkSession at planning time); same Kirsch-Mitzenmacher
        positions as ``LakeTable._bloom_prune``."""
        bl = m.get("blooms")
        if not bl or not files or not self._key_values:
            return files
        bloom_dir = os.path.join(self.path, bl["dir"])
        if not os.path.isdir(bloom_dir):
            return files
        import pyarrow.dataset as pads

        from .table import LakeTable

        salt_seed = spark_xxhash64(LakeTable._BLOOM_SALT) & 0xFFFFFFFFFFFFFFFF
        probes = [
            (spark_xxhash64(v), spark_xxhash64(v, seed=salt_seed))
            for v in self._key_values
            if isinstance(v, (str, bytes, int))
        ]
        if not probes:
            return files
        rels = {f["path"] for f in files}
        rows = {}
        for b in pads.dataset(bloom_dir, format="parquet").to_batches():
            d = b.to_pydict()
            for p, nb, bits in zip(d["path"], d["n_bits"], d["bloom"]):
                if p in rels:
                    rows[p] = (nb, bits)
        kept = []
        for f in files:
            row = rows.get(f["path"])
            if row is None:
                kept.append(f)  # no bloom row ⇒ cannot prune
                continue
            n_bits, bits = row
            hit = any(
                all(
                    bits[p // 8] & (1 << (p % 8))
                    for p in LakeTable._bloom_positions(
                        h1, h2, bl["n_hashes"], n_bits
                    )
                )
                for h1, h2 in probes
            )
            if hit:
                kept.append(f)
        return kept

    def partitions(self) -> list[LakePartition]:
        t = _table(self.path)
        m = t.manifest(self.version)
        specs = t._specs(m)
        files = list(m["files"])

        # THE MOR-safety predicate every tier below hangs on, in one
        # place: the delta bucket-classes of a given (post-prune) file
        # list, and whether a file's class could share keys with one.
        # Each tier recomputes against ITS current list on purpose — a
        # delta pruned by an earlier tier provably lacks the relevant
        # keys, shrinking the unsafe set.
        def _delta_classes(fs) -> list[tuple[int, int]]:
            return sorted(
                {
                    (specs[t._file_spec(f)], f["bucket"])
                    for f in fs
                    if f.get("delta")
                }
            )

        def _affected(f, classes) -> bool:
            nb_f = specs[t._file_spec(f)]
            return any(
                t._buckets_intersect(nb_f, f["bucket"], nb_d, b_d)
                for nb_d, b_d in classes
            )

        # --- tier 1: key bucket-hash + stats + key-hash-bounds prune
        if self._key_values is not None:
            hashed = [
                (v, spark_xxhash64(v))
                for v in self._key_values
                if isinstance(v, (str, bytes, int))
            ]
            if len(hashed) == len(self._key_values):
                b_for = {
                    sid: {h % nb for _v, h in hashed}
                    for sid, nb in specs.items()
                }
                kept = []
                for f in files:
                    if f["bucket"] not in b_for[t._file_spec(f)]:
                        continue
                    hst = (f.get("stats") or {}).get("__key_hash__")
                    if hst is not None and not any(
                        hst[0] <= h <= hst[1] for _v, h in hashed
                    ):
                        continue
                    mst = (f.get("stats") or {}).get(self._key)
                    if mst is not None:
                        cmp = [
                            v for v, _h in hashed
                            if isinstance(v, type(mst[0]))
                        ]
                        # only prune when ≥1 probe was actually comparable
                        # (a type-incomparable probe must keep the file)
                        if cmp and not any(
                            mst[0] <= v <= mst[1] for v in cmp
                        ):
                            continue
                    kept.append(f)
                files = self._bloom_keep(m, kept)

        # --- tier 1.5: key-prefix prune on manifest key min/max stats.
        # Per-key predicate ⇒ MOR-safe even inside fold groups: a pruned
        # file provably holds NO version (incl. tombstones) of any key
        # matching every prefix, so folds of matching keys are unchanged
        # and non-matching keys die in Spark's residual filter anyway.
        # Conjunctive normalization: startswith(p1) AND startswith(p2)
        # is satisfiable iff the longest prefix extends every other —
        # then it subsumes them; otherwise NO key matches at all.
        prefixes = self._key_prefixes
        if prefixes:
            longest = max(prefixes, key=len)
            if all(longest.startswith(p) for p in prefixes):
                prefixes = [longest]
                files = [
                    f
                    for f in files
                    if (mst := (f.get("stats") or {}).get(self._key)) is None
                    or _prefix_range_hits(prefixes, mst[0], mst[1])
                ]
            else:
                files = []

        # --- tier 2: warc_ts range prune (scan_file_plan's MOR-safe rules)
        if self._ts_lo is not None or self._ts_hi is not None:
            deltas = _delta_classes(files)
            kept = []
            for f in files:
                st = (f.get("stats") or {}).get("warc_ts")
                fmin, fmax = (st[0], st[1]) if st else (None, None)
                if self._ts_lo is not None and fmax is not None and fmax < self._ts_lo:
                    continue
                if (
                    self._ts_hi is not None
                    and fmin is not None
                    and fmin > self._ts_hi
                    and not (deltas and _affected(f, deltas))
                ):
                    continue
                kept.append(f)
            files = kept

        # --- tier 3: any-column manifest-stats prune (Iceberg column
        # metrics). Key-column conjuncts are per-key ⇒ fold-safe (same
        # argument as tier 1.5); payload-column conjuncts prune ONLY
        # standalone base files — inside a MOR fold group the superseding
        # version of a key may live in another file, so dropping a file
        # on payload bounds could resurrect an older, residual-passing
        # row. String bounds may be truncated (write side): still valid
        # bounds, pruning only weakens.
        if self._generic:
            deltas_g = _delta_classes(files)

            def _standalone(f) -> bool:
                return not f.get("delta") and not _affected(f, deltas_g)

            kept = []
            for f in files:
                st = f.get("stats") or {}
                nulls = f.get("nulls") or {}
                cm: dict[str, str | None] | None = None
                alone: bool | None = None  # memoized per file
                drop = False
                for col, op, val in self._generic:
                    if col != self._key:
                        if alone is None:
                            alone = _standalone(f)
                        if not alone:
                            continue
                    if cm is None:
                        cm = self._colmap(t, m, f)
                    phys = cm.get(col, col)
                    if op in ("nn", "nu"):
                        # null-count tier: a column absent at the file's
                        # epoch reads its initial default (non-null by
                        # construction) or null when there is none
                        if phys is None:
                            # a default that failed coercion reads null
                            # at scan time, so presence alone is not
                            # enough — the COERCED value must be non-null
                            has_default = self._defaults.get(col) is not None
                            drop = (op == "nn" and not has_default) or (
                                op == "nu" and has_default
                            )
                        else:
                            nc = nulls.get(phys)
                            rows = f.get("rows")
                            if nc is None or rows is None:
                                continue
                            drop = (op == "nn" and nc == rows) or (
                                op == "nu" and nc == 0
                            )
                        if drop:
                            break
                        continue
                    rng = st.get(phys) if phys is not None else None
                    if rng is not None and _stat_excludes(
                        rng[0], rng[1], op, val
                    ):
                        drop = True
                        break
                if not drop:
                    kept.append(f)
            files = kept

        # --- partition assembly: connected MOR groups fold together
        delta_classes = _delta_classes(files)
        parent = list(range(len(delta_classes)))

        def find(i):
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        for i in range(len(delta_classes)):
            for j in range(i + 1, len(delta_classes)):
                (na, ba), (nb, bb) = delta_classes[i], delta_classes[j]
                if t._buckets_intersect(na, ba, nb, bb):
                    parent[find(i)] = find(j)

        def group_of(f) -> int | None:
            nb_f = specs[t._file_spec(f)]
            for i, (nb_d, b_d) in enumerate(delta_classes):
                if t._buckets_intersect(nb_f, f["bucket"], nb_d, b_d):
                    return find(i)
            return None

        base_kwargs = dict(
            key=self._key,
            order_cols=["warc_ts", "lsn"],
            public_cols=self.public_cols,
            defaults=self._defaults,
            key_values=self._key_values,
            ts_bounds=(self._ts_lo, self._ts_hi),
            key_prefixes=prefixes,
            generic=self._generic,
        )
        groups: dict[int, list] = {}
        parts: list[LakePartition] = []
        for f in files:
            g = group_of(f) if delta_classes else None
            entry = (os.path.join(self.path, f["path"]), self._colmap(t, m, f))
            if g is None:
                parts.append(LakePartition([entry], fold=False, **base_kwargs))
            else:
                groups.setdefault(g, []).append(entry)
        for g in sorted(groups):
            parts.append(LakePartition(groups[g], fold=True, **base_kwargs))
        if not parts:
            # pruned-to-nothing plans still need ONE (empty) partition:
            # Spark invokes read(None) on an empty partition list
            parts.append(LakePartition([], fold=False, **base_kwargs))
        return parts

    # -------------------------------------------------------- reading

    @staticmethod
    def _select_row_groups(
        md, phys_key, key_values, phys_ts, lo, hi, use_ts,
        key_prefixes=(), generic=(), colmap=None,
    ):
        """Row groups that could hold a probed key / an in-range row —
        the footer-stats skip tier below the manifest's file-level prune.
        No stats ⇒ kept; only ever removes provably-irrelevant groups."""
        import datetime as dtm

        def micros(v):
            if isinstance(v, dtm.datetime):
                if v.tzinfo is not None:
                    v = v.astimezone(dtm.timezone.utc).replace(tzinfo=None)
                return int((v - dtm.datetime(1970, 1, 1)).total_seconds() * 1e6)
            return None

        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        out = []
        for rg in range(md.num_row_groups):
            keep = True
            if key_values and phys_key in idx:
                st = md.row_group(rg).column(idx[phys_key]).statistics
                if st is not None and st.has_min_max:
                    cmp = [v for v in key_values if isinstance(v, type(st.min))]
                    if cmp:  # incomparable probes cannot prune
                        keep = any(st.min <= v <= st.max for v in cmp)
            if keep and key_prefixes and phys_key in idx:
                st = md.row_group(rg).column(idx[phys_key]).statistics
                if st is not None and st.has_min_max:
                    keep = _prefix_range_hits(
                        list(key_prefixes), st.min, st.max
                    )
            if keep and use_ts and (lo is not None or hi is not None) and phys_ts in idx:
                st = md.row_group(rg).column(idx[phys_ts]).statistics
                if st is not None and st.has_min_max:
                    mn, mx = micros(st.min), micros(st.max)
                    if lo is not None and mx is not None and mx < lo:
                        keep = False
                    if hi is not None and mn is not None and mn > hi:
                        keep = False
            if keep and generic:
                for col, op, val in generic:
                    phys = (colmap or {}).get(col)
                    if phys is None or phys not in idx:
                        continue
                    st = md.row_group(rg).column(idx[phys]).statistics
                    if st is None:
                        continue
                    if op in ("nn", "nu"):
                        if not st.has_null_count:
                            continue
                        n = md.row_group(rg).num_rows
                        if (op == "nn" and st.null_count == n) or (
                            op == "nu" and st.null_count == 0
                        ):
                            keep = False
                            break
                        continue
                    if not st.has_min_max:
                        continue
                    smn = micros(st.min) if isinstance(st.min, dtm.datetime) else st.min
                    smx = micros(st.max) if isinstance(st.max, dtm.datetime) else st.max
                    if isinstance(smn, bytes) or isinstance(smx, bytes):
                        continue
                    if _stat_excludes(smn, smx, op, val):
                        keep = False
                        break
            if keep:
                out.append(rg)
        return out

    def _frame(self, batch, colmap, p):
        """Arrow batch/table → pandas under CURRENT names, pre-filtered
        by whatever predicates are safe for this partition kind."""
        import pandas as pd

        df = batch.to_pandas()
        out = pd.DataFrame(index=df.index)
        for cur, ph in colmap.items():
            if ph is not None and ph in df.columns:
                out[cur] = df[ph]
            else:
                out[cur] = p.defaults.get(cur)
        if p.key_values is not None:
            out = out[out[p.key].isin(p.key_values)]
        for pre in p.key_prefixes:
            ks = out[p.key]
            if ks.dtype == object or str(ks.dtype).startswith("str"):
                out = out[ks.str.startswith(pre).fillna(False)]
        return out

    def _emit(self, df, p):
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        dele = df["is_deleted"]
        df = df[~(dele.isna() | (dele == True))]  # noqa: E712 (vector cmp)
        if p.ts_bounds != (None, None) and not p.fold and not df.empty:
            # base-only rows stand alone: the pushed ts range applies
            # directly (fold groups leave it to Spark's residual filter)
            import pandas as pd

            mu = (
                pd.to_datetime(df["warc_ts"], utc=True)
                .dt.as_unit("us")
                .astype("int64")
            )
            lo, hi = p.ts_bounds
            mask = pd.Series(True, index=df.index)
            if lo is not None:
                mask &= mu >= lo
            if hi is not None:
                mask &= mu <= hi
            df = df[mask]
        if df.empty:
            return
        target = to_arrow_schema(self.schema)
        tbl = pa.Table.from_pandas(
            df[p.public_cols], preserve_index=False
        ).cast(target)
        yield from tbl.to_batches(max_chunksize=1 << 16)

    def read(self, partition: LakePartition) -> Iterator:
        import pandas as pd
        import pyarrow.parquet as pq

        p = partition
        if p is None:  # empty partition list ⇒ Spark calls read(None)
            return
        if not p.fold:
            # base-only files STREAM row-group by row-group — worker
            # memory is O(row group), not O(file), which is what lets one
            # task own an arbitrarily large rewritten bucket file
            for path, colmap in p.files:
                pf = pq.ParquetFile(path)
                avail = set(pf.schema_arrow.names)
                phys = [c for c in colmap.values() if c is not None and c in avail]
                rgs = self._select_row_groups(
                    pf.metadata,
                    colmap.get(p.key),
                    p.key_values,
                    colmap.get("warc_ts"),
                    p.ts_bounds[0],
                    p.ts_bounds[1],
                    use_ts=True,
                    key_prefixes=p.key_prefixes,
                    generic=p.generic,  # base-only: every conjunct safe
                    colmap=colmap,
                )
                if not rgs:
                    continue
                for batch in pf.iter_batches(row_groups=rgs, columns=phys):
                    yield from self._emit(self._frame(batch, colmap, p), p)
            return
        # merge-on-read fold group: materialize the connected bucket
        # class (the same working-set bound the CDF diff kernel has),
        # fold LWW, then emit. Row-group skipping by probed key is safe
        # here (min/max never false-prunes a key's versions); ts skipping
        # is NOT (it could drop a superseding row pre-fold).
        frames = []
        for path, colmap in p.files:
            pf = pq.ParquetFile(path)
            avail = set(pf.schema_arrow.names)
            phys = [c for c in colmap.values() if c is not None and c in avail]
            rgs = self._select_row_groups(
                pf.metadata, colmap.get(p.key), p.key_values,
                None, None, None, use_ts=False,
                key_prefixes=p.key_prefixes,
                # fold group: only per-key conjuncts may skip row groups
                generic=[g for g in p.generic if g[0] == p.key],
                colmap=colmap,
            )
            if not rgs:
                continue
            frames.append(self._frame(pf.read_row_groups(rgs, columns=phys), colmap, p))
        if not frames:
            return
        df = pd.concat(frames, ignore_index=True)
        if df.empty:
            return
        df = df.sort_values(
            [p.key, *p.order_cols], ascending=[True, False, False]
        ).drop_duplicates(subset=[p.key], keep="first")
        yield from self._emit(df, p)


class LakeMetadataReader(DataSourceReader):
    """``option("metadataTable", "files"|"snapshots"|"refs"|"partitions"|
    "columns"|"ledger")`` — the Iceberg-metadata-tables face of the
    format, sharing :meth:`LakeTable._metadata_rows` with the Python API.
    Metadata kinds are one driver-built partition of O(metadata) tuples;
    ``ledger`` reads the manifest's ledger parquets with pyarrow in one
    task (post-``compact_ledger`` that is O(1) files)."""

    def __init__(self, meta: str, options: dict):
        self.path = options["path"]
        self.meta = meta
        t = _table(self.path)
        self.version = _resolve_version(t, options)

    def schema(self) -> T.StructType:
        if self.meta == "ledger":
            from ..model import LEDGER_SCHEMA

            return LEDGER_SCHEMA
        return _table(self.path)._metadata_rows(self.meta, self.version)[0]

    def partitions(self) -> list[InputPartition]:
        return [InputPartition(0)]

    def read(self, partition) -> Iterator:
        t = _table(self.path)
        if self.meta == "ledger":
            import pyarrow.parquet as pq

            for rel in t.manifest(self.version)["ledger_files"]:
                yield from pq.ParquetFile(
                    os.path.join(self.path, rel)
                ).read().to_batches()
            return
        _schema, rows = t._metadata_rows(self.meta, self.version)
        yield from rows


class LakeDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "lake"

    @staticmethod
    def _meta_opt(options: dict) -> str | None:
        return options.get("metadataTable", options.get("metadatatable"))

    def _pinned_opts(self) -> dict:
        """Options with the snapshot resolved exactly once per query.

        ``schema()`` and ``reader()`` each need the snapshot; resolving
        independently lets a commit land in between and plan the scan at
        a newer snapshot than the schema was pinned to (and a mid-window
        rename would resolve stale names). The first call resolves — and
        walks moving refs (branch heads) down to their immutable anchor:
        a committed version int or a staged WAP token — and memoizes on
        the DataSource instance, which Spark holds for the whole query.
        """
        opts = dict(self.options)
        pin = getattr(self, "_pin", None)
        if pin is None:
            t = _table(opts["path"])
            pin = _resolve_version(t, opts)
            if isinstance(pin, str):
                # one resolution order for every ref consumer: the
                # table's own anchor walk (tag/branch → version int or
                # staged WAP token)
                pin = t.resolve_anchor(pin)
            self._pin = pin
        opts["__pinnedVersion"] = pin
        return opts

    def schema(self) -> T.StructType:
        opts = self._pinned_opts()
        meta = self._meta_opt(opts)
        if meta is not None:
            return LakeMetadataReader(meta, opts).schema()
        return lake_schema(opts)

    def reader(self, schema: T.StructType) -> DataSourceReader:
        opts = self._pinned_opts()
        meta = self._meta_opt(opts)
        if meta is not None:
            return LakeMetadataReader(meta, opts)
        return LakeReader(schema, opts)
