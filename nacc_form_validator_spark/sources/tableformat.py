"""Snapshot-versioned parquet table format (Iceberg-style stand-in).

The north rule's production target is Iceberg; this sandbox has no
Iceberg catalog, so this module implements the three Iceberg mechanics
the pipeline actually leans on, over plain parquet + JSON manifests:

1. **Snapshot isolation + time travel** — every commit writes an
   immutable manifest ``meta/v{N}.json`` listing the table's data files
   and flips an atomic ``meta/current`` pointer (write-temp +
   ``os.replace``).  Readers resolve a manifest ONCE and only ever see
   a committed file set; any historical version stays readable until
   expired.  (Single-writer: a production catalog would CAS the
   pointer; the commit protocol is otherwise identical.)
2. **Manifest-driven scans** — a read never lists directories: the
   manifest IS the file list, O(files) driver-side metadata however
   many rows the table holds, and per-file min/max stats — on the
   table key AND on every orderable column, keyed by field id — let
   :func:`snapshot_read` prune files BEFORE Spark plans the scan
   (``key_range`` / ``filters``) — Iceberg's manifest filtering with
   per-column lower/upper bounds.  At 100 TB this is the
   difference between planning over a few thousand manifest entries
   and statting a few thousand files per query.
3. **Append / copy-on-write merge as file operations** — an append
   only ADDS files; :func:`merge_upsert` rewrites exactly the files
   whose key-range stats overlap the update keys (everything else is
   carried by reference), which is how a recrawl patch touches a few
   hot files out of a petabyte.  :func:`incremental_read` reads only
   files added between two snapshots — the resumable-recrawl delta.
4. **Schema evolution by field id** — :func:`add_column` /
   :func:`rename_column` / :func:`drop_column` are metadata-only
   commits (no data file is touched at any table size).  Every column
   carries an immutable field id; each snapshot records the id→name
   binding its files were written under, and reads conform every file
   group to the CURRENT schema by id — so a rename never orphans old
   files, a re-added name never captures dropped data (fresh id), and
   a column added with a default back-fills old rows at read time.
5. **Merge-on-read deletes + compaction** — :func:`delete_keys`
   commits a takedown/GDPR key list as a DELETE FILE (no data file is
   touched: at 100 TB you cannot rewrite the table to honor a removal
   request); :func:`snapshot_read` applies pending deletes with
   Iceberg's sequence-number rule — a delete committed at version D
   erases a key only from data files added at version < D, so a later
   re-crawl of the same key is NOT swallowed by an old takedown.
   :func:`compact` bin-packs small files to a target row count and
   materializes every delete pending against the files it rewrites
   (rewritten files get the new sequence number, so stale delete
   entries become no-ops against them automatically).

Reference analogue: none (the reference validator keeps no table
state); this is the storage layer under the checkpointed decisions
sink (``sources/sinks.py``), which already gates on a real Iceberg
catalog and falls back to the same parquet layout.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_META = "meta"
_DATA = "data"


def _meta_dir(path: str) -> str:
    return os.path.join(path, _META)


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(_meta_dir(path), f"v{version}.json")


def current_version(path: str) -> int:
    """Committed table version; 0 when the table does not exist."""
    ptr = os.path.join(_meta_dir(path), "current")
    if not os.path.exists(ptr):
        return 0
    with open(ptr) as f:
        return int(f.read().strip())


def load_manifest(path: str, version: Optional[int] = None) -> dict:
    ver = current_version(path) if version is None else version
    if ver <= 0:
        raise FileNotFoundError(f"no committed snapshot at {path}")
    with open(_manifest_path(path, ver)) as f:
        return json.load(f)


def _commit(path: str, manifest: dict, ref: Optional[str] = None) -> None:
    """Write the manifest, then atomically flip a pointer — the main
    ``current`` pointer by default, or a branch ref file when ``ref``
    is given (the write-audit-publish path: main readers never see the
    branch head until :func:`publish_branch` flips ``current``).  A
    crash before the replace leaves the pointer at the old version
    with an orphan manifest — never a torn read."""
    os.makedirs(_meta_dir(path), exist_ok=True)
    mp = _manifest_path(path, manifest["version"])
    with open(mp + ".tmp", "w") as f:
        json.dump(manifest, f)
    os.replace(mp + ".tmp", mp)
    ptr = (os.path.join(_meta_dir(path), "current") if ref is None
           else _ref_path(path, ref))
    with open(ptr + ".tmp", "w") as f:
        f.write(str(manifest["version"]))
    os.replace(ptr + ".tmp", ptr)


def _next_version(path: str) -> int:
    """Next unallocated version number: 1 + the highest manifest on
    disk.  Versions are allocated globally across main AND branches
    (like Iceberg snapshot ids), so histories never collide; version
    numbers on any single ref are increasing but need not be dense."""
    meta = _meta_dir(path)
    if not os.path.isdir(meta):
        return 1
    vs = [int(f[1:-5]) for f in os.listdir(meta)
          if f.startswith("v") and f.endswith(".json")]
    return max(vs) + 1 if vs else 1


# --------------------------------------------------------------------------
# Branch refs — Iceberg's write-audit-publish (WAP) primitive.
#
# A branch is a named pointer into the same manifest store.  Commits
# to the branch advance only its ref file; ``current`` (what every
# default read resolves) is untouched, so unvalidated data is
# invisible to consumers.  After the audit passes, publish_branch
# fast-forwards ``current`` to the branch head — metadata-only, the
# candidate files are already in place.

def _ref_path(path: str, name: str) -> str:
    if not name or "/" in name or name.startswith(".") or name == "main":
        raise ValueError(f"invalid branch name {name!r}")
    return os.path.join(_meta_dir(path), f"ref-{name}")


def create_branch(path: str, name: str,
                  at_version: Optional[int] = None) -> int:
    """Create branch ``name`` at ``at_version`` (default: current
    main head).  Metadata-only: one pointer file."""
    rp = _ref_path(path, name)
    if os.path.exists(rp):
        raise ValueError(f"branch {name!r} already exists")
    ver = current_version(path) if at_version is None else at_version
    load_manifest(path, ver)          # must point at a live snapshot
    with open(rp + ".tmp", "w") as f:
        f.write(str(ver))
    os.replace(rp + ".tmp", rp)
    return ver


def ref_version(path: str, name: str) -> int:
    """Resolve a ref to its version ('main' resolves the current
    pointer).  Feed this to ``snapshot_read(..., version=...)`` /
    ``load_manifest`` to read a branch head."""
    if name == "main":
        return current_version(path)
    rp = _ref_path(path, name)
    if not os.path.exists(rp):
        raise ValueError(f"no branch {name!r}")
    with open(rp) as f:
        return int(f.read().strip())


def list_refs(path: str) -> dict:
    """name -> version for main + every branch."""
    out = {"main": current_version(path)}
    meta = _meta_dir(path)
    if os.path.isdir(meta):
        for f in sorted(os.listdir(meta)):
            if f.startswith("ref-"):
                out[f[4:]] = ref_version(path, f[4:])
    return out


def drop_branch(path: str, name: str) -> None:
    os.remove(_ref_path(path, name))


def _parent_of(path: str, version: int) -> int:
    m = load_manifest(path, version)
    # legacy manifests predate the parent field; history was linear
    return m.get("parent", version - 1)


def branch_delta(spark: SparkSession, path: str, name: str) -> DataFrame:
    """Rows in files ADDED by the branch's commits since it forked
    from main — exactly the candidate data a write-audit-publish gate
    must validate (the published rows were already audited).  Walks
    the branch head's parent chain until it meets main's chain, so
    main advancing after the fork never leaks its rows into the
    audit.  Deletes pending at the branch head apply (sequence
    rule)."""
    head = ref_version(path, name)
    main_chain = set()
    v = current_version(path)
    while v > 0:
        main_chain.add(v)
        if not os.path.exists(_manifest_path(path, v)):
            break                 # expired below here
        v = _parent_of(path, v)
    mhead = load_manifest(path, head)
    files: list = []
    v = head
    while v > 0 and v not in main_chain:
        m = load_manifest(path, v)
        files.extend(m["added"])
        v = m.get("parent", v - 1)
    return _read_with_deletes(spark, mhead, files)


def publish_branch(path: str, name: str) -> int:
    """Fast-forward main to the branch head (Iceberg's
    ``fast_forward('main', branch)``) — the PUBLISH step of
    write-audit-publish.  Metadata-only: the branch's data files were
    committed when written; this flips one pointer, so the audited
    state appears to every main reader atomically.

    Requires main's head to be an ANCESTOR of the branch head (walked
    over the manifests' parent chain).  If main advanced since the
    branch was cut, the histories diverged and a fast-forward would
    silently drop main's commits — refused; rebuild the branch from
    the new head instead."""
    head = ref_version(path, name)
    main = current_version(path)
    v = head
    while v > main:
        v = _parent_of(path, v)
    if v != main:
        raise ValueError(
            f"main (v{main}) is not an ancestor of branch {name!r} "
            f"(v{head}); histories diverged — recreate the branch "
            "from the current head")
    ptr = os.path.join(_meta_dir(path), "current")
    with open(ptr + ".tmp", "w") as f:
        f.write(str(head))
    os.replace(ptr + ".tmp", ptr)
    return head


#: fixed-width timestamp rendering — lexicographic order IS
#: chronological order, so string min/max stats prune correctly
_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def _stat_col(name: str, dtype: str):
    """Column expression whose min/max are JSON-storable AND
    order-faithful for pruning; None for unorderable types."""
    base = dtype.split("(")[0]
    if base in ("tinyint", "smallint", "int", "bigint", "float",
                "double", "decimal", "boolean", "string"):
        return F.col(name)
    if base == "timestamp":
        return F.date_format(F.col(name), _TS_FMT)
    if base == "date":
        return F.col(name).cast("string")
    return None


def _coerce_bound(v):
    """Render a Python predicate bound the way stats were stored."""
    import datetime
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, datetime.date):
        return v.isoformat()
    return v


# --------------------------------------------------------------------------
# Hidden partitioning (Iceberg partition transforms).
#
# A partition spec is a list of TRANSFORMS over source columns —
# ``[("day", "warc_ts"), ("bucket", "url", 16)]`` — applied at write
# time to lay files out by derived partition values the reader never
# sees as columns.  Each manifest file entry records its partition
# tuple, so a read with ``filters`` on the SOURCE column prunes whole
# partitions before any per-file column stats are consulted: the
# query says ``warc_ts BETWEEN a AND b AND url = u`` and the scan
# plans over only the matching day-directories' bucket — Iceberg's
# hidden partitioning, where queries never mention partition columns.
#
# Transforms (validated against the source column's Spark type):
#   identity(col)      string                  — value itself
#   bucket(col, n)     string | int | bigint   — pmod(murmur3, n)
#   truncate(col, w)   string                  — prefix of width w
#   year/month/day/hour(col)  timestamp | date — calendar truncation
#
# Every transform's partition value is rendered as a STRING whose
# lexicographic order matches the source order (calendar transforms
# use fixed-width ``yyyy-MM-dd-HH`` prefixes; identity/truncate values
# are lowercase-hex-encoded UTF-8 — order-preserving under Spark's
# binary string collation AND free of path-unsafe characters, since
# partition values become directory names), so range predicates prune
# ordered transforms and equality predicates prune buckets.
# Specs bind source columns BY FIELD ID — a rename never breaks
# pruning; dropping a partition source column is refused.

_PT = "_pt"  # partition column name prefix inside a data directory


def _mix_k1(k1: int) -> int:
    k1 = (k1 * 0xCC9E2D51) & 0xFFFFFFFF
    k1 = ((k1 << 15) | (k1 >> 17)) & 0xFFFFFFFF
    return (k1 * 0x1B873593) & 0xFFFFFFFF


def _mix_h1(h1: int, k1: int) -> int:
    h1 = (h1 ^ k1) & 0xFFFFFFFF
    h1 = ((h1 << 13) | (h1 >> 19)) & 0xFFFFFFFF
    return (h1 * 5 + 0xE6546B64) & 0xFFFFFFFF


def _fmix(h1: int, length: int) -> int:
    h1 = (h1 ^ length) & 0xFFFFFFFF
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & 0xFFFFFFFF
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & 0xFFFFFFFF
    h1 ^= h1 >> 16
    return h1


def _spark_hash(v, src: str, seed: int = 42) -> int:
    """Driver-side replica of Spark's ``F.hash`` (Murmur3 x86-32,
    seed 42) for string/int/bigint — so bucket pruning can transform a
    predicate literal WITHOUT launching a job.  Spark hashes strings
    over UTF-8 bytes in 4-byte little-endian words with a one-SIGNED-
    byte-at-a-time tail, ints as one mixed word, longs as two; parity
    is pinned by a test against ``F.hash`` on random values."""
    if src == "string":
        data = v.encode("utf-8")
        n = len(data)
        h1 = seed
        for i in range(0, n - n % 4, 4):
            h1 = _mix_h1(h1, _mix_k1(int.from_bytes(
                data[i:i + 4], "little")))
        for i in range(n - n % 4, n):
            b = data[i] - 256 if data[i] >= 128 else data[i]  # signed
            h1 = _mix_h1(h1, _mix_k1(b & 0xFFFFFFFF))
        h = _fmix(h1, n)
    elif src in ("tinyint", "smallint", "int"):
        h = _fmix(_mix_h1(seed, _mix_k1(int(v) & 0xFFFFFFFF)), 4)
    elif src == "bigint":
        u = int(v) & 0xFFFFFFFFFFFFFFFF
        h1 = _mix_h1(seed, _mix_k1(u & 0xFFFFFFFF))
        h1 = _mix_h1(h1, _mix_k1((u >> 32) & 0xFFFFFFFF))
        h = _fmix(h1, 8)
    else:
        raise ValueError(f"bucket transform on unsupported type {src!r}")
    return h - (1 << 32) if h >= (1 << 31) else h


_TIME_FMT = {"year": ("yyyy", "%Y", 4),
             "month": ("yyyy-MM", "%Y-%m", 7),
             "day": ("yyyy-MM-dd", "%Y-%m-%d", 10),
             "hour": ("yyyy-MM-dd-HH", "%Y-%m-%d-%H", 13)}


def _normalize_spec(spec: list, fields: list, dtypes: dict) -> list:
    """User spec tuples -> stored form with field-id binding and the
    source type (needed to hash bucket literals identically)."""
    by_name = {f["name"]: f["id"] for f in fields}
    out = []
    for entry in spec:
        t, col = entry[0], entry[1]
        if col not in by_name:
            raise ValueError(f"partition source column {col!r} not in "
                             f"table schema")
        src = dtypes.get(col, "").split("(")[0]
        e = {"transform": t, "fid": by_name[col], "src": src}
        if t == "bucket":
            n = int(entry[2])
            if n <= 0:
                raise ValueError("bucket n must be positive")
            if src not in ("tinyint", "smallint", "int", "bigint",
                           "string"):
                raise ValueError(f"bucket({col}) needs string/int, "
                                 f"got {src}")
            e["n"] = n
        elif t == "truncate":
            w = int(entry[2])
            if w <= 0 or src != "string":
                raise ValueError(f"truncate({col}) needs a string "
                                 f"column and positive width")
            e["w"] = w
        elif t == "identity":
            if src != "string":
                raise ValueError(f"identity({col}) supports string "
                                 f"(use bucket/truncate otherwise)")
        elif t in _TIME_FMT:
            if src not in ("timestamp", "date"):
                raise ValueError(f"{t}({col}) needs timestamp/date, "
                                 f"got {src}")
        else:
            raise ValueError(f"unknown transform {t!r}")
        out.append(e)
    return out


def _spec_cols(spec: list, fields: list) -> list:
    """Transform expressions for the current id->name binding, aliased
    ``_pt{i}`` — all rendered as strings (see module comment)."""
    names = {f["id"]: f["name"] for f in fields}
    cols = []
    for i, sp in enumerate(spec):
        c = F.col(names[sp["fid"]])
        t = sp["transform"]
        if t == "identity":
            e = F.lower(F.hex(F.encode(c, "utf-8")))
        elif t == "bucket":
            e = F.pmod(F.hash(c), F.lit(sp["n"])).cast("string")
        elif t == "truncate":
            e = F.lower(F.hex(F.encode(F.substring(c, 1, sp["w"]),
                                       "utf-8")))
        else:
            e = F.date_format(c, _TIME_FMT[t][0])
        cols.append(e.alias(f"{_PT}{i}"))
    return cols


def _transform_literal(sp: dict, v) -> Optional[str]:
    """Apply one transform to a PREDICATE literal, driver-side, in the
    same rendering the write path stored — the pruning counterpart of
    :func:`_spec_cols`."""
    import datetime
    if v is None:
        return None
    t = sp["transform"]
    if t == "identity":
        return str(v).encode("utf-8").hex()
    if t == "bucket":
        return str(_spark_hash(v, sp["src"]) % sp["n"])
    if t == "truncate":
        return str(v)[:sp["w"]].encode("utf-8").hex()
    fmt, strf, width = _TIME_FMT[t]
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.strftime(strf)
    return str(v)[:width]       # 'YYYY-MM-DD HH:MM:SS' prefix


def _prune_partitions(files: list, manifest: dict,
                      filters: Optional[dict]) -> list:
    """Hidden-partition pruning: drop files whose partition tuple
    cannot satisfy ``filters`` on the TRANSFORM SOURCE columns.
    Ordered transforms (identity/truncate/calendar) prune on ranges;
    bucket prunes on equality only (``(v, v)``).  Files without a
    recorded tuple (written before the spec, or by a writer predating
    it) are conservatively kept — pruning is never lossy."""
    specs = manifest.get("partition_specs")
    cur = manifest.get("partition_spec") or []
    if not filters or (not cur and not specs):
        return files
    names = {f["id"]: f["name"] for f in manifest["fields"]}

    def build_checks(spec):
        checks = []
        for i, sp in enumerate(spec or []):
            col = names.get(sp["fid"])
            if col is None or col not in filters:
                continue
            lo, hi = filters[col]
            if sp["transform"] == "bucket":
                if lo is None or hi is None or lo != hi:
                    continue    # bucket cannot prune a range
                b = _transform_literal(sp, lo)
                checks.append((i, b, b))
            else:
                checks.append((i,
                               _transform_literal(sp, lo),
                               _transform_literal(sp, hi)))
        return checks

    # spec evolution: each file prunes under the spec IT WAS WRITTEN
    # with (Iceberg v2) — legacy files (no spec_id) resolve to spec 0
    # when a spec log exists, else to the table's single spec
    by_spec: dict = {}

    def checks_for(f):
        if specs is None:
            sid = "__single__"
            spec = cur
        else:
            sid = str(f.get("spec_id", 0))
            spec = specs.get(sid)
        if sid not in by_spec:
            by_spec[sid] = build_checks(spec)
        return by_spec[sid]

    out = []
    for f in files:
        pt = f.get("pt")
        keep = True
        if pt is not None:
            for i, plo, phi in checks_for(f):
                v = pt[i] if i < len(pt) else None
                if v is None:
                    continue
                if (plo is not None and v < plo) or (
                        phi is not None and v > phi):
                    keep = False
                    break
        if keep:
            out.append(f)
    return out


# --------------------------------------------------------------------------
# Per-file key Bloom filters (Iceberg puffin-style secondary index).
#
# Min/max bounds prune point lookups only when files are key-clustered;
# a table written in crawl order has every file spanning nearly the
# full url range, so ``url = u`` scans everything.  A small per-file
# Bloom filter over the key (``bloom_bits`` at table creation, default
# k=4 probes via double hashing off two Murmur3 hashes) lets the
# driver drop files whose filter cannot contain the literal — false
# positives only cost an extra file scan, never a missed row.  The
# probe reuses :func:`_spark_hash`, so no job runs to test a literal.

_BLOOM_SALT = "\x01b"
_BLOOM_K = 4


def _bloom_positions_expr(key: str, m: int):
    s = F.col(key).cast("string")
    h1 = F.pmod(F.hash(s).cast("bigint"), F.lit(1 << 32))
    h2 = F.pmod(F.hash(F.concat(s, F.lit(_BLOOM_SALT))).cast("bigint"),
                F.lit(1 << 32))
    return F.array(*[F.pmod(h1 + F.lit(i) * h2, F.lit(m)).cast("int")
                     for i in range(_BLOOM_K)])


def _bloom_probe_positions(v, m: int) -> list:
    s = str(v)
    h1 = _spark_hash(s, "string") % (1 << 32)
    h2 = _spark_hash(s + _BLOOM_SALT, "string") % (1 << 32)
    return [(h1 + i * h2) % m for i in range(_BLOOM_K)]


def _bloom_bitmaps(df, key: str, m: int) -> dict:
    """path -> hex bitmap of the key Bloom filter for the files in
    ``df``.  One distinct-positions pass over only the NEW files of a
    commit (a production writer folds this into the write itself);
    per-file driver payload is bounded by m bits however many rows."""
    rows = (df.select(F.input_file_name().alias("path"),
                      F.explode(_bloom_positions_expr(key, m)).alias("p"))
            .distinct()
            .groupBy("path").agg(F.collect_set("p").alias("ps"))
            .collect())
    out = {}
    for r in rows:
        bits = bytearray(m // 8)
        for p in r["ps"]:
            bits[p // 8] |= 1 << (p % 8)
        out[r["path"]] = bytes(bits).hex()
    return out


def _bloom_may_contain(bitmap_hex: str, v, m: int) -> bool:
    bits = bytes.fromhex(bitmap_hex)
    return all(bits[p // 8] & (1 << (p % 8))
               for p in _bloom_probe_positions(v, m))


#: HLL register count for manifest NDV sketches (matches the
#: sketches module's query default so the oracle form is shared)
_NDV_M = 64


def _file_stats(spark: SparkSession, data_dir: str, key: str,
                seq: int, fields: Optional[list] = None,
                n_pt: int = 0, read_schema: Optional[dict] = None,
                bloom_bits: Optional[int] = None,
                ndv_cols: Optional[list] = None,
                spec_id: Optional[int] = None) -> list:
    """Per-file (rows, min/max key, sequence number) for the files
    just written — one aggregate over only the new files, collected as
    O(files) metadata.  Iceberg gathers these stats at write time
    inside the writer; here it is a follow-up scan of the same (still
    page-cached) files.  ``seq`` is the committing version: the
    ordinal that decides which delete files apply to these rows.

    With ``fields`` (the write-time id→name binding), min/max is also
    recorded for EVERY orderable column, keyed by FIELD ID — rename-
    proof, so :func:`snapshot_read` can prune files on any column
    predicate however the schema evolves later (Iceberg's per-column
    lower/upper bounds).  A table laid out by ``zorder_layout`` turns
    these into multi-dimensional file skipping.

    ``n_pt`` > 0 means ``data_dir`` is laid out by ``partitionBy`` on
    ``_pt0.._pt{n-1}`` string columns: the read supplies an explicit
    schema (so directory values stay strings — no type inference) and
    each file entry additionally records its partition tuple."""
    if n_pt:
        from pyspark.sql.types import StringType, StructField, StructType
        base = StructType.fromJson(read_schema)
        full = StructType(list(base.fields) + [
            StructField(f"{_PT}{i}", StringType()) for i in range(n_pt)])
        df = spark.read.schema(full).parquet(data_dir)
    else:
        df = spark.read.parquet(data_dir)
    aggs = [F.count(F.lit(1)).alias("rows"),
            F.min(key).alias("min"), F.max(key).alias("max")]
    for i in range(n_pt):
        # partitionBy guarantees one value per file — first() is exact
        aggs.append(F.first(f"{_PT}{i}").alias(f"{_PT}{i}"))
    tracked = []
    if fields is not None:
        dtypes = dict(df.dtypes)
        for fld in fields:
            c = _stat_col(fld["name"], dtypes.get(fld["name"], ""))
            if c is not None:
                fid = str(fld["id"])
                tracked.append(fid)
                aggs.append(F.min(c).alias(f"_lo_{fid}"))
                aggs.append(F.max(c).alias(f"_hi_{fid}"))
    rows = (df.groupBy(F.input_file_name().alias("path"))
            .agg(*aggs).collect())
    out = []
    for r in rows:
        e = {"path": r["path"], "rows": r["rows"],
             "min": r["min"], "max": r["max"], "seq": seq}
        if tracked:
            e["cols"] = {fid: [r[f"_lo_{fid}"], r[f"_hi_{fid}"]]
                         for fid in tracked}
        if n_pt:
            e["pt"] = [r[f"{_PT}{i}"] for i in range(n_pt)]
        out.append(e)
    if spec_id is not None:
        for e in out:
            e["spec_id"] = spec_id
    if ndv_cols and fields is not None:
        # per-file HLL registers per tracked column (puffin-style NDV
        # sketch, keyed by FIELD ID like the min/max bounds): one extra
        # aggregate per column over only the new (page-cached) files;
        # registers merge by max, so reads estimate table-level NDV
        # without opening a single data file
        from ..operators.sketches import hll_registers
        name_to_id = {f["name"]: str(f["id"]) for f in fields}
        for cname in ndv_cols:
            fid = name_to_id[cname]
            regs = hll_registers(
                df.select(F.input_file_name().alias("__path"),
                          F.col(cname).cast("string").alias("__k")),
                F.col("__k"), group_cols=["__path"], m=_NDV_M)
            per: dict = {}
            for r in regs.collect():
                per.setdefault(r["__path"], {})[str(r["bucket"])] = \
                    int(r["reg"])
            for e in out:
                e.setdefault("ndv", {})[fid] = per.get(e["path"], {})
    if bloom_bits:
        blooms = _bloom_bitmaps(df, key, bloom_bits)
        for e in out:
            if e["path"] in blooms:
                e["bloom"] = blooms[e["path"]]
    return sorted(out, key=lambda d: d["path"])


def _write_data(df: DataFrame, sub: str, key: str, ver: int,
                fields: list, spec: Optional[list],
                schema_json: dict, n_out: Optional[int] = None,
                bloom_bits: Optional[int] = None,
                ndv_cols: Optional[list] = None,
                spec_id: Optional[int] = None) -> list:
    """Write one snapshot's data files honoring the table's partition
    spec and return their manifest entries.  With a spec the rows are
    hash-distributed on the partition tuple first (Iceberg's
    ``write.distribution-mode=hash``) so each partition is written by
    few tasks instead of every task emitting a sliver into every
    partition — at 1000 executors that is the difference between
    O(partitions) and O(partitions x tasks) files per commit."""
    spark = df.sparkSession
    if not spec:
        out = df if n_out is None else df.coalesce(n_out)
        out.write.mode("error").parquet(sub)
        return _file_stats(spark, sub, key, ver, fields=fields,
                           bloom_bits=bloom_bits, ndv_cols=ndv_cols,
                           spec_id=spec_id)
    pts = _spec_cols(spec, fields)
    names = [f"{_PT}{i}" for i in range(len(spec))]
    d = df.select("*", *pts)
    d = (d.repartition(*names) if n_out is None
         else d.repartition(n_out, *names))
    d.write.mode("error").partitionBy(*names).parquet(sub)
    return _file_stats(spark, sub, key, ver, fields=fields,
                       n_pt=len(spec), read_schema=schema_json,
                       bloom_bits=bloom_bits, ndv_cols=ndv_cols,
                       spec_id=spec_id)


def _new_fields(schema) -> list:
    return [{"id": i + 1, "name": f.name}
            for i, f in enumerate(schema.fields)]


def _ws_entry(manifest_or_schema, fields) -> dict:
    """The id→name/type binding files written NOW carry — recorded per
    snapshot so reads can conform any file to any later schema."""
    return {"fields": fields, "schema": manifest_or_schema}


def snapshot_write(df: DataFrame, path: str, key: str,
                   mode: str = "append",
                   token: Optional[str] = None,
                   partition_spec: Optional[list] = None,
                   bloom_bits: Optional[int] = None,
                   ndv_cols: Optional[list] = None,
                   ref: str = "main") -> int:
    """Commit ``df`` as a new snapshot; returns the new version.

    ``append`` adds files next to the current file set (``df`` must
    carry the table's CURRENT schema — evolve first, then write);
    ``overwrite`` starts a fresh file set and resets the schema —
    either way no existing data file is touched, so every prior
    version stays time-travel readable.

    ``partition_spec`` (table creation / overwrite only) lays data out
    by hidden partition transforms — ``[("day", "warc_ts"),
    ("bucket", "url", 16)]`` — recorded in the manifest per file, so
    reads with ``filters`` on the SOURCE columns prune whole
    partitions (see the module's hidden-partitioning comment).
    Appends inherit the table's spec; passing one on append is an
    error (spec evolution is a rewrite via ``overwrite``).

    ``bloom_bits`` (table creation / overwrite only; power-of-8 bit
    count, e.g. 2048) adds a per-file Bloom filter over the key to
    every data file's manifest entry — point lookups (``key_range=(v,
    v)`` or ``filters={key: (v, v)}``) then prune files min/max bounds
    cannot, e.g. a table written in crawl order where every file spans
    the full url range.  Inherited by appends/merges/compaction.

    ``token`` makes the commit IDEMPOTENT: if a live manifest already
    carries the token, the write is skipped and that snapshot's
    version is returned — the exactly-once handshake a streaming
    ``foreachBatch`` sink needs when a micro-batch is replayed after a
    crash (the batch reached the table, the source checkpoint did
    not).

    ``ref`` commits to a branch created by :func:`create_branch`
    instead of main — the WRITE step of write-audit-publish: the
    candidate data lands in the table store but main readers cannot
    see it until :func:`publish_branch`.  A branch write bases itself
    on the BRANCH head (not main) and advances only the branch
    pointer."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"unknown mode {mode!r}")
    spark = df.sparkSession
    base_ver = (current_version(path) if ref == "main"
                else ref_version(path, ref))
    ver = _next_version(path)
    fresh = mode == "overwrite" or base_ver == 0
    prev = None if fresh else load_manifest(path, base_ver)
    if prev is None and ref != "main":
        # a fresh file set on a branch is legal (overwrite candidate),
        # but the TABLE must exist — branches fork from a table
        load_manifest(path)
    if token is not None and prev is not None:
        seen = prev.get("tokens", {})
        if token in seen:
            return seen[token]
    if prev is not None:
        want = [f["name"] for f in prev["fields"]]
        if df.columns != want:
            raise ValueError(
                f"append schema mismatch: table has {want}, "
                f"df has {df.columns}")
        if partition_spec is not None:
            raise ValueError("partition_spec is set at table creation; "
                             "appends inherit it")
        if bloom_bits is not None:
            raise ValueError("bloom_bits is set at table creation; "
                             "appends inherit it")
        if ndv_cols is not None:
            raise ValueError("ndv_cols is set at table creation; "
                             "appends inherit it")
    wfields = _new_fields(df.schema) if prev is None else prev["fields"]
    if prev is None:
        spec = (_normalize_spec(partition_spec, wfields, dict(df.dtypes))
                if partition_spec else None)
        if bloom_bits is not None and (bloom_bits <= 0
                                       or bloom_bits % 8):
            raise ValueError("bloom_bits must be a positive multiple "
                             "of 8")
        bloom = bloom_bits
        if ndv_cols is not None:
            missing = [c for c in ndv_cols if c not in df.columns]
            if missing:
                raise ValueError(f"ndv_cols not in schema: {missing}")
        ndv = list(ndv_cols) if ndv_cols else None
        schema = df.schema.jsonValue()
    else:
        spec = prev.get("partition_spec")
        bloom = prev.get("bloom_bits")
        ndv = prev.get("ndv_cols")
        schema = prev["schema"]
    sub = os.path.join(path, _DATA, f"s{ver}")
    spec_log = None if prev is None else prev.get("partition_specs")
    cur_sid = 0 if prev is None else int(prev.get("current_spec_id", 0))
    added = _write_data(df, sub, key, ver, wfields, spec, schema,
                        bloom_bits=bloom, ndv_cols=ndv,
                        spec_id=cur_sid if spec_log is not None
                        else None)
    if prev is None:
        fields = wfields
        files, deletes, ws = added, [], {}
        last_id = len(fields)
        tokens: dict = {}
    else:
        fields = prev["fields"]
        files = prev["files"] + added
        deletes = prev.get("deletes", [])
        ws = dict(prev["write_schemas"])
        last_id = prev["last_field_id"]
        tokens = dict(prev.get("tokens", {}))
    if token is not None:
        tokens[token] = ver
    ws[str(ver)] = _ws_entry(schema, fields)
    _commit(path, {"version": ver, "parent": base_ver,
                   "operation": mode, "key": key,
                   "schema": schema, "fields": fields,
                   "partition_spec": spec, "bloom_bits": bloom,
                   "partition_specs": spec_log,
                   "current_spec_id": cur_sid,
                   "ndv_cols": ndv,
                   "last_field_id": last_id, "write_schemas": ws,
                   "tokens": tokens,
                   "files": files, "added": added, "deletes": deletes},
            ref=None if ref == "main" else ref)
    return ver


def _prune(files: list, key_range: Optional[Tuple]) -> list:
    if key_range is None:
        return files
    lo, hi = key_range
    return [f for f in files
            if not (f["max"] is not None and lo is not None
                    and f["max"] < lo)
            and not (f["min"] is not None and hi is not None
                     and f["min"] > hi)]


def _prune_filters(files: list, manifest: dict,
                   filters: Optional[dict]) -> list:
    """Drop files whose per-column lower/upper bounds are disjoint from
    ``filters`` ({column: (lo, hi)}, either bound None for open-ended).
    Columns resolve to FIELD IDS against the manifest's current
    schema, so a filter keeps pruning correctly across renames.  Files
    without recorded bounds for a column (pre-stats snapshots, all-NULL
    columns) are conservatively kept — pruning is never lossy."""
    if not filters:
        return files
    ids = {f["name"]: str(f["id"]) for f in manifest["fields"]}
    unknown = sorted(set(filters) - set(ids))
    if unknown:
        raise ValueError(f"filters on unknown columns: {unknown}")
    out = []
    for f in files:
        stats = f.get("cols", {})
        keep = True
        for col, (lo, hi) in filters.items():
            b = stats.get(ids[col])
            if b is None or b[0] is None or b[1] is None:
                continue
            lo, hi = _coerce_bound(lo), _coerce_bound(hi)
            if (lo is not None and b[1] < lo) or (
                    hi is not None and b[0] > hi):
                keep = False
                break
        if keep:
            out.append(f)
    return out


def _prune_bloom(files: list, manifest: dict,
                 key_range: Optional[Tuple],
                 filters: Optional[dict]) -> list:
    """Point-lookup pruning via per-file key Bloom filters: when the
    predicate pins the table key to ONE value, drop files whose filter
    cannot contain it.  Files without a filter (pre-bloom snapshots)
    are conservatively kept; false positives only cost a scan."""
    m = manifest.get("bloom_bits")
    if not m:
        return files
    key = manifest["key"]
    v = None
    if (key_range is not None and key_range[0] is not None
            and key_range[0] == key_range[1]):
        v = key_range[0]
    elif filters and key in filters:
        lo, hi = filters[key]
        if lo is not None and lo == hi:
            v = lo
    if v is None:
        return files
    return [f for f in files
            if "bloom" not in f or _bloom_may_contain(f["bloom"], v, m)]


def manifest_files(path: str, version: Optional[int] = None,
                   key_range: Optional[Tuple] = None,
                   filters: Optional[dict] = None) -> list:
    """The file entries a read at ``version`` would scan, after
    min/max-stats pruning by ``key_range`` and per-column ``filters``
    — exposed so callers (and tests) can audit pruning without running
    the scan.  Partition pruning (hidden transforms) applies first,
    then per-file column bounds — both feed from the same ``filters``
    on source columns."""
    manifest = load_manifest(path, version)
    files = _prune_partitions(manifest["files"], manifest, filters)
    files = _prune_filters(_prune(files, key_range), manifest, filters)
    return _prune_bloom(files, manifest, key_range, filters)


def manifest_count(path: str, version: Optional[int] = None) -> int:
    """``count(*)`` answered from manifest row stats alone — no job,
    no file is opened, O(files) driver work at any table size
    (Iceberg's count pushdown).  Exact only while no merge-on-read
    delete is pending (a delete file's erased-row count is unknown
    without a scan), so that case refuses rather than over-counts —
    run :func:`compact` (which materializes deletes) first."""
    m = load_manifest(path, version)
    if m.get("deletes"):
        raise ValueError(
            "manifest_count is exact only without pending merge-on-read "
            "deletes; compact first or count via snapshot_read")
    return sum(f["rows"] for f in m["files"])


def _empty(spark: SparkSession, manifest: dict) -> DataFrame:
    from pyspark.sql.types import StructType
    return spark.createDataFrame([], StructType.fromJson(
        manifest["schema"]))


def _read_seq_group(spark: SparkSession, manifest: dict, seq: int,
                    grp: list) -> DataFrame:
    """Read one snapshot's files with their WRITE-TIME schema and
    conform to the manifest's CURRENT schema by field id: renamed
    columns follow their id, columns added later back-fill their
    default (NULL when none), dropped columns are simply not selected.
    Metadata-only evolution, exact at read."""
    from pyspark.sql.types import StructType
    w = manifest["write_schemas"][str(seq)]
    wschema = StructType.fromJson(w["schema"])
    # explicit file list — no directory listing, no partition discovery
    df = spark.read.schema(wschema).parquet(*[f["path"] for f in grp])
    cur_fields = manifest["fields"]
    cur_schema = StructType.fromJson(manifest["schema"])
    written = {f["id"]: f["name"] for f in w["fields"]}
    if [f["name"] for f in cur_fields] == [
            written.get(f["id"]) for f in cur_fields]:
        return df.select([f["name"] for f in cur_fields])
    cols = []
    for cf, sf in zip(cur_fields, cur_schema.fields):
        wname = written.get(cf["id"])
        if wname is None:      # column added after this file was written
            cols.append(F.lit(cf.get("default")).cast(sf.dataType)
                        .alias(cf["name"]))
        else:
            cols.append(F.col(wname).cast(sf.dataType).alias(cf["name"]))
    return df.select(*cols)


def _read_files(spark: SparkSession, manifest: dict,
                files: list) -> DataFrame:
    """Conformed read of an explicit file list (no delete filtering) —
    one schema-conforming scan per originating snapshot, unioned."""
    if not files:
        return _empty(spark, manifest)
    parts = [
        _read_seq_group(spark, manifest, seq,
                        [f for f in files if f["seq"] == seq])
        for seq in sorted({f["seq"] for f in files})]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _read_with_deletes(spark: SparkSession, manifest: dict,
                       files: list) -> DataFrame:
    """Data files minus pending merge-on-read deletes.  Sequence rule
    (Iceberg equality deletes): a delete committed at version D erases
    a key only from files with seq < D — a key re-added AFTER the
    takedown survives it.  Files are grouped by seq (one group per
    committing snapshot, so a handful however large the table) and
    each group anti-joins the broadcast union of exactly the delete
    files that postdate it."""
    deletes = manifest.get("deletes", [])
    if not deletes or not files:
        return _read_files(spark, manifest, files)
    from pyspark.sql.types import StructType
    key = manifest["key"]
    full = StructType.fromJson(manifest["schema"])
    kschema = StructType([full[key]])
    parts = []
    for seq in sorted({f["seq"] for f in files}):
        grp = [f for f in files if f["seq"] == seq]
        live = [d for d in deletes if d["seq"] > seq]
        df = _read_seq_group(spark, manifest, seq, grp)
        if live:
            dk = (spark.read.schema(kschema)
                  .parquet(*[d["path"] for d in live])
                  .select(key).distinct())
            df = df.join(F.broadcast(dk), key, "left_anti")
        parts.append(df)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def snapshot_read(spark: SparkSession, path: str,
                  version: Optional[int] = None,
                  key_range: Optional[Tuple] = None,
                  filters: Optional[dict] = None,
                  ref: Optional[str] = None) -> DataFrame:
    """Read the table as of ``version`` (default: current).
    ``key_range=(lo, hi)`` prunes data files by manifest key stats and
    ``filters`` ({column: (lo, hi)}) by the per-column bounds BEFORE
    Spark ever plans the scan; the residual row filters still apply
    inside each surviving file, so the result is exact (equality is
    ``filters={col: (v, v)}``).  Pending merge-on-read deletes are
    applied (see :func:`delete_keys`).  Combined with a Z-ordered
    layout (``operators/layout.py``) the per-column bounds skip files
    on EVERY interleaved dimension, not just the table key.
    ``ref`` reads a branch head (the AUDIT step of
    write-audit-publish); mutually exclusive with ``version``."""
    if ref is not None:
        if version is not None:
            raise ValueError("pass version or ref, not both")
        version = ref_version(path, ref)
    manifest = load_manifest(path, version)
    files = _prune_partitions(manifest["files"], manifest, filters)
    files = _prune_filters(_prune(files, key_range), manifest, filters)
    files = _prune_bloom(files, manifest, key_range, filters)
    df = _read_with_deletes(spark, manifest, files)
    if key_range is not None:
        lo, hi = key_range
        k = F.col(manifest["key"])
        if lo is not None:
            df = df.where(k >= F.lit(lo))
        if hi is not None:
            df = df.where(k <= F.lit(hi))
    for col, (lo, hi) in (filters or {}).items():
        if lo is not None:
            df = df.where(F.col(col) >= F.lit(lo))
        if hi is not None:
            df = df.where(F.col(col) <= F.lit(hi))
    return df


def incremental_read(spark: SparkSession, path: str, since: int,
                     until: Optional[int] = None) -> DataFrame:
    """Rows in files ADDED by snapshots ``since+1 .. until`` — the
    recrawl delta.  Append snapshots yield exactly their new rows; a
    merge snapshot's delta also carries the rewritten survivors of the
    files it replaced (append-only changelog semantics — downstream
    consumers dedupe on the table key, newest snapshot wins)."""
    until = current_version(path) if until is None else until
    files: List[dict] = []
    manifest = None
    for v in range(since + 1, until + 1):
        manifest = load_manifest(path, v)
        files.extend(manifest["added"])
    if manifest is None:          # empty range
        manifest = load_manifest(path, until if until > 0 else None)
        files = []
    return _read_files(spark, manifest, files)


def merge_upsert(updates: DataFrame, path: str,
                 token: Optional[str] = None,
                 ref: str = "main") -> int:
    """Copy-on-write MERGE: replace current rows whose key appears in
    ``updates`` (insert the rest).  Only data files whose min/max key
    stats overlap an update key are rewritten; every other file is
    carried into the new snapshot by reference — the petabyte table
    pays for the hot files, not a full rewrite.

    Update keys are collected to the driver to drive file pruning and
    are broadcast into the anti-join, so updates are assumed to be the
    small side (a recrawl patch, a takedown list); bulk rewrites
    should use ``snapshot_write(mode='overwrite')`` instead."""
    import bisect

    spark = updates.sparkSession
    manifest = load_manifest(path, None if ref == "main"
                             else ref_version(path, ref))
    if token is not None and token in manifest.get("tokens", {}):
        return manifest["tokens"][token]
    key = manifest["key"]
    want = [f["name"] for f in manifest["fields"]]
    if updates.columns != want:
        raise ValueError(f"merge schema mismatch: table has {want}, "
                         f"updates has {updates.columns}")
    keys = sorted(r[0] for r in updates.select(key).distinct().collect())
    if not keys:
        raise ValueError("merge_upsert: updates carry no keys")

    def overlaps(f: dict) -> bool:
        if f["min"] is None or f["max"] is None:
            return True
        i = bisect.bisect_left(keys, f["min"])
        return i < len(keys) and keys[i] <= f["max"]

    touched = [f for f in manifest["files"] if overlaps(f)]
    kept = [f for f in manifest["files"] if not overlaps(f)]
    # read touched files THROUGH pending deletes — a rewrite must not
    # resurrect a taken-down row by re-materializing it at a new seq
    survivors = (_read_with_deletes(spark, manifest, touched)
                 .join(F.broadcast(updates.select(key)), key,
                       "left_anti"))
    ver = _next_version(path)
    sub = os.path.join(path, _DATA, f"s{ver}")
    added = _write_data(survivors.unionByName(updates), sub, key, ver,
                        manifest["fields"],
                        manifest.get("partition_spec"),
                        manifest["schema"],
                        bloom_bits=manifest.get("bloom_bits"),
                        ndv_cols=manifest.get("ndv_cols"),
                        spec_id=(manifest.get("current_spec_id", 0)
                                 if manifest.get("partition_specs")
                                 is not None else None))
    ws = dict(manifest["write_schemas"])
    ws[str(ver)] = _ws_entry(manifest["schema"], manifest["fields"])
    tokens = dict(manifest.get("tokens", {}))
    if token is not None:
        tokens[token] = ver
    _commit(path, {"version": ver,
                   "parent": manifest["version"], "operation": "merge", "key": key,
                   "tokens": tokens,
                   "schema": manifest["schema"],
                   "fields": manifest["fields"],
                   "partition_spec": manifest.get("partition_spec"),
                   "bloom_bits": manifest.get("bloom_bits"),
                   "ndv_cols": manifest.get("ndv_cols"),
                   "partition_specs": manifest.get("partition_specs"),
                   "current_spec_id": manifest.get("current_spec_id", 0),
                   "last_field_id": manifest["last_field_id"],
                   "write_schemas": ws,
                   "files": kept + added, "added": added,
                   "deletes": manifest.get("deletes", [])},
            ref=None if ref == "main" else ref)
    return ver


def delete_keys(keys: DataFrame, path: str,
                token: Optional[str] = None,
                ref: str = "main") -> int:
    """Merge-on-read DELETE: commit the keys in ``keys`` as a delete
    file — NO data file is read or rewritten (the takedown/GDPR path:
    at 100 TB honoring a removal list by rewrite is not an option).
    Readers subtract the keys via a broadcast anti-join under the
    sequence rule: the delete applies only to data files committed
    BEFORE it, so appending the key again later re-inserts it.
    Physical removal happens when :func:`compact` (or a merge) next
    rewrites the affected files."""
    spark = keys.sparkSession
    manifest = load_manifest(path, None if ref == "main"
                             else ref_version(path, ref))
    if token is not None and token in manifest.get("tokens", {}):
        return manifest["tokens"][token]
    key = manifest["key"]
    ver = _next_version(path)
    sub = os.path.join(path, _DATA, f"d{ver}")
    dk = keys.select(key).distinct()
    dk.coalesce(1).write.mode("error").parquet(sub)
    entry = _file_stats(spark, sub, key, ver)
    if sum(e["rows"] for e in entry) == 0:
        raise ValueError("delete_keys: no keys to delete")
    tokens = dict(manifest.get("tokens", {}))
    if token is not None:
        tokens[token] = ver
    _commit(path, {"version": ver,
                   "parent": manifest["version"], "operation": "delete", "key": key,
                   "tokens": tokens,
                   "schema": manifest["schema"],
                   "fields": manifest["fields"],
                   "partition_spec": manifest.get("partition_spec"),
                   "bloom_bits": manifest.get("bloom_bits"),
                   "ndv_cols": manifest.get("ndv_cols"),
                   "partition_specs": manifest.get("partition_specs"),
                   "current_spec_id": manifest.get("current_spec_id", 0),
                   "last_field_id": manifest["last_field_id"],
                   "write_schemas": manifest["write_schemas"],
                   "files": manifest["files"], "added": [],
                   "deletes": manifest.get("deletes", []) + entry},
            ref=None if ref == "main" else ref)
    return ver


def compact(path: str, target_rows: int,
            spark: Optional[SparkSession] = None) -> int:
    """Bin-pack data files smaller than ``target_rows`` into
    ~target-sized files and materialize every delete pending against
    them; files already at size are carried by reference.  Rewritten
    rows get the NEW sequence number, so older delete entries become
    no-ops against them by the sequence rule — the entries stay in the
    manifest only for any small-enough-to-carry files they still
    cover, and expire with their manifests.  Returns the new version
    (the current one when there is nothing to compact)."""
    if spark is None:
        spark = SparkSession.getActiveSession()
    manifest = load_manifest(path)
    key = manifest["key"]
    small = [f for f in manifest["files"] if f["rows"] < target_rows]
    if len(small) < 2:
        return manifest["version"]
    kept = [f for f in manifest["files"] if f["rows"] >= target_rows]
    total = sum(f["rows"] for f in small)
    n_out = max(1, -(-total // target_rows))
    ver = _next_version(path)
    sub = os.path.join(path, _DATA, f"s{ver}")
    added = _write_data(_read_with_deletes(spark, manifest, small),
                        sub, key, ver, manifest["fields"],
                        manifest.get("partition_spec"),
                        manifest["schema"], n_out=n_out,
                        bloom_bits=manifest.get("bloom_bits"),
                        ndv_cols=manifest.get("ndv_cols"),
                        spec_id=(manifest.get("current_spec_id", 0)
                                 if manifest.get("partition_specs")
                                 is not None else None))
    ws = dict(manifest["write_schemas"])
    ws[str(ver)] = _ws_entry(manifest["schema"], manifest["fields"])
    # A delete entry is live only while some remaining file predates it
    # (sequence rule); once every covered file is rewritten the entry is
    # a no-op — drop it so e.g. manifest_count is exact again.
    live = [d for d in manifest.get("deletes", [])
            if any(f["seq"] < d["seq"] for f in kept + added)]
    _commit(path, {"version": ver,
                   "parent": manifest["version"], "operation": "compact", "key": key,
                   "tokens": manifest.get("tokens", {}),
                   "schema": manifest["schema"],
                   "fields": manifest["fields"],
                   "partition_spec": manifest.get("partition_spec"),
                   "bloom_bits": manifest.get("bloom_bits"),
                   "ndv_cols": manifest.get("ndv_cols"),
                   "partition_specs": manifest.get("partition_specs"),
                   "current_spec_id": manifest.get("current_spec_id", 0),
                   "last_field_id": manifest["last_field_id"],
                   "write_schemas": ws,
                   "files": kept + added, "added": added,
                   "deletes": live})
    return ver


def rewrite_clustered(path: str, target_rows: int,
                      spark: Optional[SparkSession] = None) -> int:
    """Key-clustered full rewrite (Iceberg's sort-order
    ``rewrite_data_files``): every data file is rewritten range-
    distributed and sorted on the table key, so files carry DISJOINT
    key ranges and min/max bounds prune point AND range lookups that a
    crawl-ordered layout defeats — the complementary fix to the
    per-file Bloom index, which accelerates equality probes only.
    Pending merge-on-read deletes are materialized, and since no old
    file survives, every delete entry is dropped (sequence rule:
    nothing predates them any more) — :func:`manifest_count` is exact
    again afterwards.  Layout-only: the row multiset is unchanged and
    :func:`table_changelog` across the rewrite reports no changes
    (both laws pinned by tests).

    Partition-spec'd tables are refused: hidden partitioning already
    prunes whole directories on the partition source columns, and a
    global range distribution would fight the spec's layout.

    Scale: ``repartitionByRange`` samples the key (one lightweight
    pass), then ONE total-order shuffle rewrites the table — the same
    cost Iceberg's sort rewrite pays, amortized across every
    subsequent pruned read.  Returns the new version."""
    if spark is None:
        spark = SparkSession.getActiveSession()
    manifest = load_manifest(path)
    if manifest.get("partition_spec"):
        raise ValueError("rewrite_clustered applies to unpartitioned "
                         "tables; partitioned tables already prune by "
                         "their spec")
    key = manifest["key"]
    total = sum(f["rows"] for f in manifest["files"])
    n_out = max(1, -(-total // target_rows))
    ver = _next_version(path)
    sub = os.path.join(path, _DATA, f"s{ver}")
    df = _read_with_deletes(spark, manifest, manifest["files"])
    (df.repartitionByRange(n_out, key).sortWithinPartitions(key)
       .write.mode("error").parquet(sub))
    added = _file_stats(spark, sub, key, ver,
                        fields=manifest["fields"],
                        bloom_bits=manifest.get("bloom_bits"),
                        ndv_cols=manifest.get("ndv_cols"),
                        spec_id=(manifest.get("current_spec_id", 0)
                                 if manifest.get("partition_specs")
                                 is not None else None))
    ws = dict(manifest["write_schemas"])
    ws[str(ver)] = _ws_entry(manifest["schema"], manifest["fields"])
    _commit(path, {"version": ver,
                   "parent": manifest["version"], "operation": "cluster", "key": key,
                   "tokens": manifest.get("tokens", {}),
                   "schema": manifest["schema"],
                   "fields": manifest["fields"],
                   "partition_spec": None,
                   "bloom_bits": manifest.get("bloom_bits"),
                   "ndv_cols": manifest.get("ndv_cols"),
                   "partition_specs": manifest.get("partition_specs"),
                   "current_spec_id": manifest.get("current_spec_id", 0),
                   "last_field_id": manifest["last_field_id"],
                   "write_schemas": ws,
                   "files": added, "added": added, "deletes": []})
    return ver


def _evolve(path: str, op: str, fields: list, schema: dict,
            last_id: Optional[int] = None) -> int:
    """Metadata-only schema commit: same files, same deletes, new
    current schema — O(1) however large the table."""
    manifest = load_manifest(path)
    ver = _next_version(path)
    _commit(path, {"version": ver,
                   "parent": manifest["version"], "operation": op,
                   "key": manifest["key"], "schema": schema,
                   "tokens": manifest.get("tokens", {}),
                   "fields": fields,
                   "partition_spec": manifest.get("partition_spec"),
                   "bloom_bits": manifest.get("bloom_bits"),
                   "ndv_cols": manifest.get("ndv_cols"),
                   "partition_specs": manifest.get("partition_specs"),
                   "current_spec_id": manifest.get("current_spec_id", 0),
                   "last_field_id": (manifest["last_field_id"]
                                     if last_id is None else last_id),
                   "write_schemas": manifest["write_schemas"],
                   "files": manifest["files"], "added": [],
                   "deletes": manifest.get("deletes", [])})
    return ver


def add_column(path: str, name: str, dtype: str,
               default=None) -> int:
    """Add a column (metadata-only).  ``dtype`` is a Spark DDL type
    string ('string', 'int', ...); rows written before this commit
    read as ``default`` (NULL when omitted) — back-filled at read
    time, never by rewrite.  The new column gets a FRESH field id, so
    re-adding a previously dropped name cannot capture old data."""
    from pyspark.sql.types import StructType
    manifest = load_manifest(path)
    if any(f["name"] == name for f in manifest["fields"]):
        raise ValueError(f"column {name!r} already exists")
    schema = StructType.fromJson(manifest["schema"])
    new_field = StructType.fromDDL(f"`{name}` {dtype}").fields[0]
    schema = StructType(schema.fields + [new_field])
    # ids are never reused (Iceberg's last-assigned-id rule): a
    # re-added name after a drop must get a FRESH id or old files'
    # dropped data would leak back in under the new column
    nid = manifest["last_field_id"] + 1
    entry: dict = {"id": nid, "name": name}
    if default is not None:
        entry["default"] = default
    return _evolve(path, "add-column",
                   manifest["fields"] + [entry], schema.jsonValue(),
                   last_id=nid)


def rename_column(path: str, old: str, new: str) -> int:
    """Rename a column (metadata-only).  Old files keep their written
    name; reads follow the field id.  The table key cannot be renamed
    (delete files are bound to its name)."""
    from pyspark.sql.types import StructType, StructField
    manifest = load_manifest(path)
    if old == manifest["key"]:
        raise ValueError("cannot rename the table key column")
    names = [f["name"] for f in manifest["fields"]]
    if old not in names:
        raise ValueError(f"no column {old!r}")
    if new in names:
        raise ValueError(f"column {new!r} already exists")
    fields = [dict(f, name=new) if f["name"] == old else f
              for f in manifest["fields"]]
    schema = StructType.fromJson(manifest["schema"])
    schema = StructType([
        StructField(new, f.dataType, f.nullable) if f.name == old else f
        for f in schema.fields])
    return _evolve(path, "rename-column", fields, schema.jsonValue())


def drop_column(path: str, name: str) -> int:
    """Drop a column (metadata-only).  The data stays in the old
    files — time travel to a pre-drop version still reads it — but no
    current read selects it.  The table key cannot be dropped."""
    from pyspark.sql.types import StructType
    manifest = load_manifest(path)
    if name == manifest["key"]:
        raise ValueError("cannot drop the table key column")
    if not any(f["name"] == name for f in manifest["fields"]):
        raise ValueError(f"no column {name!r}")
    fid = next(f["id"] for f in manifest["fields"] if f["name"] == name)
    if any(sp["fid"] == fid
           for sp in manifest.get("partition_spec") or []):
        raise ValueError(f"column {name!r} is a partition transform "
                         f"source; rewrite via overwrite first")
    fields = [f for f in manifest["fields"] if f["name"] != name]
    schema = StructType.fromJson(manifest["schema"])
    schema = StructType([f for f in schema.fields if f.name != name])
    return _evolve(path, "drop-column", fields, schema.jsonValue())


def table_history(spark: SparkSession, path: str) -> DataFrame:
    """One row per live snapshot: version, operation, files/rows
    visible at that version, files/rows added by it, and pending
    delete-file keys.  ``n_rows`` counts PHYSICAL rows (manifest
    stats); merge-on-read deletes subtract at read time, so a 'delete'
    snapshot leaves n_rows unchanged until a compact/merge
    materializes it — exactly Iceberg's bookkeeping.  Walks MAIN's
    parent chain, so unpublished branch commits never appear."""
    rows = []
    v = current_version(path)
    while v > 0 and os.path.exists(_manifest_path(path, v)):
        m = load_manifest(path, v)
        rows.append((m["version"], m["operation"],
                     len(m["files"]),
                     sum(f["rows"] for f in m["files"]),
                     len(m["added"]),
                     sum(f["rows"] for f in m["added"]),
                     sum(d["rows"] for d in m.get("deletes", []))))
        v = _parent_of(path, v)
    rows.reverse()
    return spark.createDataFrame(
        rows, "version int, operation string, n_files int, "
              "n_rows bigint, n_added_files int, n_added_rows bigint, "
              "n_delete_keys bigint")


def expire_snapshots(path: str, keep_last: int = 1) -> dict:
    """Drop every manifest outside main's newest ``keep_last``
    parent-chain entries and delete data files no kept manifest
    references.  Metadata-only bookkeeping plus targeted deletes —
    never a table scan.  Also garbage-collects manifests/files left by
    DROPPED branches (they are off main's chain).  Refuses while live
    branches exist: their referenced files are invisible from main's
    chain and would be swept — publish or drop them first."""
    if len(list_refs(path)) > 1:
        raise ValueError("live branches exist; publish_branch or "
                         "drop_branch before expire_snapshots")
    kept: set = set()
    v = current_version(path)
    while (v > 0 and len(kept) < keep_last
           and os.path.exists(_manifest_path(path, v))):
        kept.add(v)
        v = _parent_of(path, v)
    live: set = set()
    for v in kept:
        m = load_manifest(path, v)
        live.update(f["path"] for f in m["files"])
        live.update(d["path"] for d in m.get("deletes", []))
    dropped_manifests = dropped_files = 0
    meta = _meta_dir(path)
    for fn in sorted(os.listdir(meta)):
        if not (fn.startswith("v") and fn.endswith(".json")):
            continue
        v = int(fn[1:-5])
        if v in kept:
            continue
        m = load_manifest(path, v)
        for f in m["files"] + m.get("deletes", []):
            if f["path"] not in live:
                local = f["path"].replace("file:", "", 1)
                if os.path.exists(local):
                    os.remove(local)
                    dropped_files += 1
                live.add(f["path"])   # count each orphan once
        os.remove(_manifest_path(path, v))
        dropped_manifests += 1
    return {"dropped_manifests": dropped_manifests,
            "dropped_files": dropped_files}


def rollback(path: str, version: int) -> int:
    """Restore the table to an earlier snapshot as a NEW commit (the
    bad commit stays readable for forensics — nothing is deleted
    until :func:`expire_snapshots`).  Metadata-only: the new manifest
    is the target version's file/delete/schema state under the next
    version number.  The operational undo for a bad recrawl merge or
    an over-eager takedown."""
    cur = current_version(path)
    if not 1 <= version <= cur:
        raise ValueError(f"no snapshot v{version} (current is v{cur})")
    target = load_manifest(path, version)
    latest = load_manifest(path, cur)
    ver = _next_version(path)
    _commit(path, {"version": ver, "parent": cur,
                   "operation": f"rollback-to-v{version}",
                   "key": target["key"], "schema": target["schema"],
                   "fields": target["fields"],
                   "partition_spec": target.get("partition_spec"),
                   "bloom_bits": target.get("bloom_bits"),
                   # ids already burned stay burned: a post-rollback
                   # add_column must not reuse a rolled-back id
                   "last_field_id": latest["last_field_id"],
                   "tokens": latest.get("tokens", {}),
                   "write_schemas": target["write_schemas"],
                   "files": target["files"], "added": [],
                   "deletes": target.get("deletes", [])})
    return ver


def apply_changes(changes: DataFrame, path: str, op_col: str = "op",
                  token: Optional[str] = None,
                  ref: str = "main") -> int:
    """Apply one changelog batch (CDC): rows carry the table columns
    plus ``op_col`` in {'upsert', 'delete'} (a delete row only needs
    its key).  Upserts go through the copy-on-write merge, deletes
    through the merge-on-read delete file — so a batch costs rewriting
    only the files the upsert keys touch plus one O(keys) delete file.
    When a key is both upserted and deleted in the SAME batch the
    delete wins (it commits after, and the sequence rule erases the
    just-rewritten row); order changes across batches to express the
    opposite.  ``token`` idempotence covers BOTH commits separately
    (suffixes ':u' / ':d'), so a crash between them replays exactly
    the missing half.  ``ref`` applies the batch to a BRANCH (CDC
    write-audit-publish: the changelog lands invisibly, the audit
    validates, publish_branch flips main).  Returns the final
    version."""
    manifest = load_manifest(path, None if ref == "main"
                             else ref_version(path, ref))
    key = manifest["key"]
    cols = [f["name"] for f in manifest["fields"]]
    ops = changes.select(op_col).distinct()
    bad = [r[0] for r in ops.collect() if r[0] not in
           ("upsert", "delete")]
    if bad:
        raise ValueError(f"unknown ops {bad!r}")
    ver = manifest["version"]
    ups = changes.where(F.col(op_col) == "upsert").select(*cols)
    if ups.limit(1).count():
        ver = merge_upsert(ups, path,
                           token=None if token is None else token + ":u",
                           ref=ref)
    dels = changes.where(F.col(op_col) == "delete").select(key)
    if dels.limit(1).count():
        ver = delete_keys(dels, path,
                          token=None if token is None else token + ":d",
                          ref=ref)
    return ver


def _conform_between(df: DataFrame, ma: dict, mb: dict) -> DataFrame:
    """Project a DataFrame read under manifest ``ma``'s current schema
    into manifest ``mb``'s current schema BY FIELD ID: a column renamed
    between the two versions follows its id, a column added after
    ``ma`` back-fills its default, a column dropped since ``ma`` is
    simply not selected.  The changelog's cross-version comparator."""
    from pyspark.sql.types import StructType
    ids_a = {f["id"]: f["name"] for f in ma["fields"]}
    cur = StructType.fromJson(mb["schema"])
    cols = []
    for bf, sf in zip(mb["fields"], cur.fields):
        an = ids_a.get(bf["id"])
        if an is None:        # column added after `ma`
            cols.append(F.lit(bf.get("default")).cast(sf.dataType)
                        .alias(bf["name"]))
        else:
            cols.append(F.col(an).cast(sf.dataType).alias(bf["name"]))
    return df.select(*cols)


def table_changelog(spark: SparkSession, path: str, since: int,
                    until: Optional[int] = None) -> DataFrame:
    """Exact row-level CDC between two snapshots: the table's current
    columns (as of ``until``) plus ``op`` in {'insert', 'update',
    'delete'} — insert/update rows carry the NEW values, delete rows
    the OLD values.  Replaying the changelog onto the ``since`` state
    (insert/update -> :func:`apply_changes` upserts, delete -> deletes)
    reproduces the ``until`` state exactly; tests pin that law.

    Scale: this is Iceberg's changelog scan, not two table scans — data
    files are immutable and path-identified, so files present in BOTH
    manifests cancel without being read.  Only files ADDED or REMOVED
    in the range are scanned (each under its own snapshot's delete
    state), plus, for delete-file commits in the range, the key-matched
    rows of the common files they erase from (broadcast semi-join of
    the new delete keys).  The final full-outer join on the table key
    is sized by the CHANGE, not the table, and null-safe payload
    comparison cancels merge-rewrite survivors (a copy-on-write merge
    rewrites whole files to patch a few keys; the untouched co-resident
    rows must not surface as updates).  A rollback inside the range can
    resurrect rows by REMOVING delete files — the one case file-diffing
    cannot localize, so it falls back to the exact full diff."""
    until = current_version(path) if until is None else until
    ma, mb = load_manifest(path, since), load_manifest(path, until)
    key = mb["key"]
    kid = next(f["id"] for f in mb["fields"] if f["name"] == key)
    if not any(f["id"] == kid for f in ma["fields"]):
        raise ValueError("table key has no counterpart at `since`")
    paths_b = {f["path"] for f in mb["files"]}
    paths_a = {f["path"] for f in ma["files"]}
    dels_a = {d["path"] for d in ma.get("deletes", [])}
    resurrected = dels_a - {d["path"] for d in mb.get("deletes", [])}
    if resurrected:               # rollback in range: exact full diff
        removed = snapshot_read(spark, path, version=since)
        added = snapshot_read(spark, path, version=until)
    else:
        only_a = [f for f in ma["files"] if f["path"] not in paths_b]
        only_b = [f for f in mb["files"] if f["path"] not in paths_a]
        removed = _read_with_deletes(spark, ma, only_a)
        added = _read_with_deletes(spark, mb, only_b)
        # delete files committed in the range erase rows from files
        # carried by reference: read exactly the key-matched,
        # previously-visible rows of the common files they apply to
        new_dels = [d for d in mb.get("deletes", [])
                    if d["path"] not in dels_a]
        common = [f for f in ma["files"] if f["path"] in paths_b]
        hit = [f for f in common
               if any(d["seq"] > f["seq"] for d in new_dels)]
        if hit:
            from pyspark.sql.types import StructType
            kschema = StructType([StructType.fromJson(mb["schema"])[key]])
            nk = (spark.read.schema(kschema)
                  .parquet(*[d["path"] for d in new_dels
                             if any(d["seq"] > f["seq"] for f in hit)])
                  .select(key).distinct())
            erased = (_read_with_deletes(spark, ma, hit)
                      .join(F.broadcast(nk), key, "left_semi"))
            removed = removed.unionByName(erased)
    removed = _conform_between(removed, ma, mb)
    cols = [f["name"] for f in mb["fields"]]
    payload = [c for c in cols if c != key]
    o, n = removed.alias("o"), added.alias("n")
    j = o.join(n, F.col(f"o.{key}").eqNullSafe(F.col(f"n.{key}")),
               "full_outer")
    old_k, new_k = F.col(f"o.{key}"), F.col(f"n.{key}")
    same = F.lit(True)
    for c in payload:
        same = same & F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
    op = (F.when(old_k.isNull(), F.lit("insert"))
          .when(new_k.isNull(), F.lit("delete"))
          .when(same, F.lit(None))           # rewrite survivor: no change
          .otherwise(F.lit("update")))
    side = F.when(op == "delete", F.lit("o")).otherwise(F.lit("n"))
    out = j.select(
        *[F.when(side == "o", F.col(f"o.{c}"))
          .otherwise(F.col(f"n.{c}")).alias(c) for c in cols],
        op.alias("op"))
    return out.where(F.col("op").isNotNull())


def table_ndv(path: str, col: str,
              version: Optional[int] = None) -> "tuple[int, float]":
    """(n_filled, est_distinct): approximate number of distinct values
    of ``col`` across the table's LIVE data files, answered from the
    manifest's per-file HLL registers — no Spark job, no data file
    opened (Iceberg's puffin NDV-sketch read path; the CBO input a
    join planner wants).

    Registers merge by per-bucket max (HLL union is exact), so the
    merged estimate EQUALS the one-shot estimate over the same rows —
    the table-level value hash-matches ``hll_distinct`` run on the
    full data (same alpha, same small-range correction, same round-4).
    Requires the table to have been created with ``ndv_cols``; files
    written before tracking raise (fail-closed, like
    ``manifest_count`` under pending deletes).  Merge-on-read deletes
    do NOT subtract (sketches are insert-only) — the estimate covers
    rows as written; compaction re-sketches and makes it exact again.
    """
    import math

    from ..operators.sketches import _alpha

    man = load_manifest(path, version)
    tracked = man.get("ndv_cols") or []
    if col not in tracked:
        raise ValueError(
            f"table_ndv: column {col!r} is not NDV-tracked "
            f"(ndv_cols={tracked})")
    fid = None
    for f in man["fields"]:
        if f["name"] == col:
            fid = str(f["id"])
    merged: dict = {}
    for entry in man["files"]:
        regs = entry.get("ndv", {}).get(fid)
        if regs is None:
            raise ValueError(
                f"table_ndv: file {entry['path']} carries no NDV "
                f"registers for {col!r} (written before tracking?)")
        for b, r in regs.items():
            bi = int(b)
            if r > merged.get(bi, 0):
                merged[bi] = r
    m = _NDV_M
    n_filled = len(merged)
    zeros = float(m - n_filled)
    s = sum(2.0 ** (-merged[b]) for b in sorted(merged))
    amm = _alpha(m) * m * m
    raw = amm / (s + zeros)
    est = (m * math.log(m / zeros)
           if (raw <= 2.5 * m and zeros > 0) else raw)
    return n_filled, round(est, 4)


def evolve_partition_spec(path: str,
                          new_spec: Optional[list]) -> int:
    """Partition-spec evolution (Iceberg v2, metadata-only): future
    writes lay data out — and record partition tuples — under
    ``new_spec``; EXISTING files keep the spec they were written with
    and keep pruning under it, so the commit moves ZERO data.  Pass
    None to make future writes unpartitioned.  Reads are unaffected
    (file access is path-explicit; partition values live only in the
    manifest).  Merge and compaction rewrites adopt the CURRENT spec,
    which is how old layouts migrate incrementally — exactly
    Iceberg's behavior.

    The spec log assigns every spec an id; file entries written after
    the first evolution carry their spec id, and legacy entries
    resolve to spec 0 (the creation spec)."""
    from pyspark.sql.types import StructType
    manifest = load_manifest(path)
    st = StructType.fromJson(manifest["schema"])
    dtypes = {f.name: f.dataType.simpleString() for f in st.fields}
    spec = (_normalize_spec(new_spec, manifest["fields"], dtypes)
            if new_spec else None)
    specs = dict(manifest.get("partition_specs") or {})
    if not specs:
        specs["0"] = manifest.get("partition_spec")
    new_id = max(int(k) for k in specs) + 1
    specs[str(new_id)] = spec
    ver = _next_version(path)
    _commit(path, {"version": ver,
                   "parent": manifest["version"],
                   "operation": "evolve-spec",
                   "key": manifest["key"],
                   "schema": manifest["schema"],
                   "tokens": manifest.get("tokens", {}),
                   "fields": manifest["fields"],
                   "partition_spec": spec,
                   "partition_specs": specs,
                   "current_spec_id": new_id,
                   "bloom_bits": manifest.get("bloom_bits"),
                   "ndv_cols": manifest.get("ndv_cols"),
                   "last_field_id": manifest["last_field_id"],
                   "write_schemas": manifest["write_schemas"],
                   "files": manifest["files"], "added": [],
                   "deletes": manifest.get("deletes", [])})
    return ver
