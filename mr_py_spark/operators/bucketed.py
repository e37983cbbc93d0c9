"""Bucketed-warehouse TPC-H (B22 made first-class; SURVEY.md §2B).

SCALE.md's answer to the headline join gap (q3/q5-class fact joins are
shuffle-floor-bound on one node) is a bucketed warehouse: persist
lineitem and orders bucketed + per-bucket-sorted on the order key, and
every subsequent orderkey equi-join is a ZERO-EXCHANGE sort-merge join
— the layout a 100 TB deployment would maintain for a fact table that
is joined on the same key every day. Until r10 that claim lived only in
tests (tests/test_sinks.py); ``q5_bucketed`` promotes it to a
registered, oracle-backed query the driver checks: same answer as
``q5_local_supplier``, bitwise, from the bucketed layout.

Warehouse lifecycle: built ONCE per sf_dir under a deterministic temp
cache (the dpp_weekend_events pattern — _COMPLETE marker, idempotent
across runs) via ``saveAsTable`` with an explicit LOCATION, so nothing
touches the externally-owned session's static warehouse dir. A later
session that finds the files but not the catalog entry re-registers
the table with CREATE TABLE ... CLUSTERED BY ... LOCATION — bucket
metadata lives in the catalog, not the files, so the DDL must replay
the bucket spec exactly.
"""

from __future__ import annotations

import os
import re
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mr_py_spark.functions import dec4, fmt_ts, ts_ntz
from mr_py_spark.registry import register
from mr_py_spark.sources import tbl
from mr_py_spark.sources.sinks import write_bucketed

#: Bucket count = this deployment's core count (local[32]). A bucketed
#: scan reads ONE task per bucket, so the bucket count CAPS scan
#: parallelism: the r10 sf100 A/B measured the 16-bucket layout at only
#: ~1.1x over the shuffle form because 16 tasks scanned 13 GB of
#: lineitem on 32 cores (vs 1.5-1.6x at sf10 where the scan fit the
#: task width) — size buckets to the cluster's parallelism, not the
#: fixture. At 100 TB that means thousands of buckets. r17 (VERDICT
#: r16 item 7): env-tunable so a cluster deployment sizes it to task
#: width without a source edit; the default is unchanged and the spec
#: is stamped into every standing table, so a drifted value fails
#: loudly on append (Spark validates the bucket spec) and the
#: content-stamped warehouse rebuilds rather than serving a stale
#: layout.
_BUCKETS = int(os.environ.get("SPARK_GRAFT_BUCKETS", "32"))
_CACHE_ROOT_NAME = "spark_graft_bucketed"


def _src_stamp(sf_dir: str, name: str, extra: str = "") -> str:
    """Content stamp of the source fixture file (size + mtime_ns): a
    regenerated fixture at the SAME path must invalidate the cached
    warehouse — gen_sf.py rewrites /tmp/sparkgraft/sfN in place, and a
    stale bucketed copy would silently diverge from what DuckDB and
    every other query read. ``extra`` folds BUILDER PARAMETERS into the
    stamp (r12: the ivf_corpus quantizer's nlist changed and the
    fixture-only stamp would have served the stale coarse index — any
    derived table whose builder has knobs must stamp them)."""
    st = os.stat(f"{sf_dir.rstrip('/')}/{name}.parquet")
    return f"{st.st_size}:{st.st_mtime_ns}" + (f":{extra}" if extra else "")


def builder_stamp(*fns, **knobs) -> str:
    """Short digest of a derived-table BUILDER: the source text of the
    functions whose behavior the persisted content depends on, plus
    explicit knob values. Closes the whole stale-cache class the r12
    nlist incident exposed (review r12: stamping one hand-picked knob
    misses seeds, split constants, iteration counts, and any future
    edit to the builder body) — pass this as ``stamp_extra``."""
    import hashlib
    import inspect

    h = hashlib.sha256()
    for fn in fns:
        try:
            h.update(inspect.getsource(fn).encode())
        except (OSError, TypeError):
            h.update(f"{fn.__module__}.{fn.__qualname__}".encode())
        h.update(b"\x00")
    for k in sorted(knobs):
        h.update(f"{k}={knobs[k]!r}".encode())
        h.update(b"\x00")
    return h.hexdigest()[:12]


def _bucketed_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    key: str,
    frame_of=None,
    src_name: str | None = None,
    schema: str | None = None,
    stamp_extra: str = "",
) -> DataFrame:
    """The fixture table ``name`` — or, with ``frame_of``, an arbitrary
    DERIVED frame (e.g. the standing LSH band index) — as a catalog
    table bucketed+sorted on ``key`` (built/registered on first use per
    sf_dir; cached on disk and in the session catalog thereafter).
    ``frame_of`` is a zero-arg builder returning the frame to persist;
    ``src_name`` names the fixture parquet whose content stamp
    invalidates the cache (defaults to ``name`` — a derived frame must
    pass the table it derives from). ``frame_of`` is invoked ONLY on
    the actual build branch (ADVICE r11: the ivf centroid builder runs
    a driver-side k-means EAGERLY, and re-attaching valid persisted
    files in a fresh session must not pay that); a re-attach derives
    the DDL column list from ``schema`` (a DDL string like
    ``'cid long, cv array<double>'``) when given, falling back to
    ``frame_of()`` only when it must. The bucket count is baked into
    the table name AND cache dir: a knob change must never re-attach
    files written under a different count — the CREATE TABLE bucket
    spec is metadata the files cannot contradict-check. The _COMPLETE
    marker stores the SOURCE file's content stamp, so a regenerated
    fixture rebuilds instead of serving stale buckets; a mkdir lock
    serializes concurrent first builds (two overwriting writers would
    interleave files, then both stamp complete)."""
    tag = f"b{_BUCKETS}_" + re.sub(r"[^0-9a-zA-Z]+", "_", sf_dir.strip("/"))
    table = f"mrps_bkt_{name}_{tag}"
    stamp = _src_stamp(sf_dir, src_name or name, extra=stamp_extra)

    def marker_ok(done: str) -> bool:
        try:
            with open(done) as f:
                return f.read().strip() == stamp
        except OSError:
            return False

    if spark.catalog.tableExists(table):
        root = os.path.join(tempfile.gettempdir(), _CACHE_ROOT_NAME, tag)
        if marker_ok(os.path.join(root, f"_{name}_COMPLETE")):
            return spark.table(table)
        spark.sql(f"DROP TABLE {table}")  # fixture regenerated under us
    root = os.path.join(tempfile.gettempdir(), _CACHE_ROOT_NAME, tag)
    path = os.path.join(root, name)
    done = os.path.join(root, f"_{name}_COMPLETE")
    lock = os.path.join(root, f"_{name}_LOCK")
    src: DataFrame | None = None

    def frame() -> DataFrame:
        nonlocal src
        if src is None:
            src = frame_of() if frame_of is not None else tbl(spark, sf_dir, name)
        return src

    if not marker_ok(done):
        os.makedirs(root, exist_ok=True)
        import time

        # Wait out a concurrent builder. The cap must dwarf the
        # worst-case one-time build (sf100 lineitem+orders measured
        # 146 s; allow an hour — a spurious "stuck" here aborts a
        # correct run, while a genuinely dead builder is a crashed
        # process whose lock a human clears). Only the process that
        # actually CREATED the lock dir may remove it: a waiter that
        # exits via marker_ok must not delete a lock a rebuilder just
        # re-acquired after a fixture regeneration (ADVICE r10).
        acquired = False
        try:
            deadline = time.monotonic() + 3600
            while True:
                try:
                    os.mkdir(lock)
                    acquired = True
                    break
                except FileExistsError:
                    if marker_ok(done):
                        break
                    if time.monotonic() > deadline:
                        raise RuntimeError(f"bucketed build lock stuck: {lock}")
                    time.sleep(0.1)
            if acquired and not marker_ok(done):
                try:
                    os.remove(done)
                except OSError:
                    pass
                shutil.rmtree(path, ignore_errors=True)
                if schema is not None:
                    # the hand-written re-attach DDL must match what is
                    # actually persisted: builder drift would otherwise
                    # only surface in a FRESH session's re-attach scan
                    # (review r12) — catch it at write time, where the
                    # frame is in hand anyway. Compare (name, type)
                    # pairs, not strings (DDL 'long' == simpleString
                    # 'bigint') and not nullability (writer-dependent).
                    from pyspark.sql.types import StructType

                    want = [
                        (f.name, f.dataType)
                        for f in StructType.fromDDL(schema).fields
                    ]
                    built = [
                        (f.name, f.dataType) for f in frame().schema.fields
                    ]
                    if built != want:
                        raise ValueError(
                            f"{table}: declared re-attach schema "
                            f"{schema!r} != built frame schema "
                            f"{frame().schema.simpleString()!r}"
                        )
                write_bucketed(frame(), table, key, _BUCKETS, path=path)
                tmp = done + ".tmp"
                with open(tmp, "w") as f:
                    f.write(stamp)
                os.replace(tmp, done)
        finally:
            if acquired:
                shutil.rmtree(lock, ignore_errors=True)
    if not spark.catalog.tableExists(table):
        # files built by this or an earlier session: (re-)attach. The
        # bucket spec is catalog metadata, so the DDL must state it —
        # from the explicit ``schema`` when given (the write path
        # already ran or never will this session; deriving it from
        # frame_of() would eagerly re-run the builder, ADVICE r11).
        keys = ", ".join([key] if isinstance(key, str) else list(key))
        cols = schema or ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in frame().schema
        )
        spark.sql(
            f"CREATE TABLE {table} ({cols}) USING parquet "
            f"CLUSTERED BY ({keys}) SORTED BY ({keys}) INTO {_BUCKETS} BUCKETS "
            f"LOCATION '{path}'"
        )
    return spark.table(table)


def _table_location(spark: SparkSession, table: str) -> str:
    """Filesystem path of ``table``'s data, scheme stripped — local
    deployments only; an object store would keep the URI.

    Fast path (r16): the session catalog's metadata lookup through the
    JVM gateway — a few py4j calls, ~2 ms. The previous
    ``DESCRIBE FORMATTED`` form planned and executed a whole SQL
    command (~165 ms measured), and this helper sits under EVERY
    per-batch sidecar read (replay guard, LSH banding/gauge, drift
    reference), where it was the dominant term once the sidecars
    themselves became cheap JSON reads. The DESCRIBE fallback covers
    sessions without a JVM gateway (e.g. Spark Connect)."""
    try:
        ss = spark._jsparkSession.sessionState()
        ident = ss.sqlParser().parseTableIdentifier(table)
        loc = str(ss.catalog().getTableMetadata(ident).location())
    except Exception:
        loc = (
            spark.sql(f"DESCRIBE FORMATTED {table}")
            .filter(F.col("col_name") == "Location")
            .head()
            .data_type
        )
    return re.sub(r"^file:", "", loc)


def _data_files(path: str) -> list[str]:
    """The parquet part files under a table location (what a scan
    actually opens — markers and _SUCCESS excluded)."""
    out = []
    for dirpath, _dirs, files in os.walk(path):
        out.extend(
            os.path.join(dirpath, f) for f in files if f.endswith(".parquet")
        )
    return sorted(out)


def _commit_marker(path: str) -> str:
    """Two-phase-commit marker for ``compact_bucketed_table``'s swap:
    lives NEXT TO the data directory (not inside it — the directory is
    what gets renamed), and exists exactly while a swap is in flight."""
    return path.rstrip("/") + "__commit.json"


def recover_compaction(spark: SparkSession, path: str) -> bool:
    """Re-attach-on-next-use recovery for a ``compact_bucketed_table``
    swap that crashed mid-window (VERDICT r12 item 6). Keyed on the
    DATA PATH because the crash window is exactly where the catalog
    entry does not exist. Returns False if no swap is in flight.

    The marker is written only after the compacted side copy is
    complete, so recovery ROLLS FORWARD whenever that generation
    survives (it is the better layout) and rolls back to the original
    directory otherwise; either generation has identical content, so
    the recovered table is always full-fidelity. Idempotent: a crash
    during recovery leaves the marker, and the next call finishes."""
    import json

    marker = _commit_marker(path)
    if not os.path.exists(marker):
        return False
    with open(marker) as f:
        m = json.load(f)
    path = m["path"]
    tmp_path = f"{path.rstrip('/')}__compacting"
    old_path = f"{path.rstrip('/')}__old"
    if not os.path.isdir(path):
        if os.path.isdir(tmp_path):
            os.replace(tmp_path, path)  # roll forward: compacted copy
        elif os.path.isdir(old_path):
            os.replace(old_path, path)  # roll back: original survives
        else:
            raise RuntimeError(
                f"recover_compaction: no generation of {path} survives — "
                "not reachable from a single mid-swap crash"
            )
    elif os.path.isdir(tmp_path):
        # crash before the renames: original still live at path, the
        # complete compacted copy at the side path — roll forward
        spark.sql(f"DROP TABLE IF EXISTS {m['table']}")
        shutil.rmtree(old_path, ignore_errors=True)
        os.replace(path, old_path)
        os.replace(tmp_path, path)
    for t in (m["tmp_tbl"], m["table"]):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    key_list = ", ".join(m["keys"])
    spark.sql(
        f"CREATE TABLE {m['table']} ({m['cols']}) USING parquet "
        f"CLUSTERED BY ({key_list}) SORTED BY ({key_list}) "
        f"INTO {m['n_buckets']} BUCKETS LOCATION '{path}'"
    )
    shutil.rmtree(old_path, ignore_errors=True)
    shutil.rmtree(tmp_path, ignore_errors=True)
    os.remove(marker)
    return True


def _swap_in_side_copy(
    spark: SparkSession, table: str, tmp_tbl: str, path: str,
    cols: str, keys: list[str], n_buckets: int,
) -> None:
    """Publish a COMPLETE side copy at ``<path>__compacting`` as the
    new generation of ``table`` at ``path`` — the marker-file two-phase
    commit shared by compaction (same bytes, fewer files) and retrain-
    style rebuilds (new contents, same spec). The marker carrying the
    replay DDL is durable before the first destructive step and removed
    only after the re-attach; ``recover_compaction(spark, path)``
    finishes or rolls back a swap that crashed at any point
    (crash-injection-tested in tests/test_sinks.py)."""
    import json

    tmp_path = f"{path.rstrip('/')}__compacting"
    old_path = f"{path.rstrip('/')}__old"
    marker = _commit_marker(path)
    with open(marker + ".tmp", "w") as f:
        json.dump(
            {"table": table, "tmp_tbl": tmp_tbl, "path": path,
             "cols": cols, "keys": keys, "n_buckets": n_buckets},
            f,
        )
    os.replace(marker + ".tmp", marker)
    spark.sql(f"DROP TABLE {tmp_tbl}")
    spark.sql(f"DROP TABLE {table}")
    os.replace(path, old_path)
    os.replace(tmp_path, path)
    key_list = ", ".join(keys)
    spark.sql(
        f"CREATE TABLE {table} ({cols}) USING parquet "
        f"CLUSTERED BY ({key_list}) SORTED BY ({key_list}) "
        f"INTO {n_buckets} BUCKETS LOCATION '{path}'"
    )
    os.remove(marker)  # phase 2 committed: swap fully re-attached
    shutil.rmtree(old_path, ignore_errors=True)


def replace_bucketed_table(
    spark: SparkSession, table: str, frame: DataFrame,
    key: str | tuple[str, ...], n_buckets: int = _BUCKETS,
) -> None:
    """REBUILD a standing EXTERNAL bucketed table's contents in place
    — the maintenance primitive behind ``ivf_retrain`` (a drift-
    triggered quantizer rebuild rewrites centroids AND the inverted
    file under the same bucket spec). Side-write the new frame, then
    the same crash-atomic two-phase swap compaction uses: a reader (or
    a crashed rebuild, via ``recover_compaction``) always sees a
    complete generation, never a half-written table. Like compaction,
    the frame is repartitioned on the bucket keys so the writer emits
    one file per occupied bucket."""
    keys = [key] if isinstance(key, str) else list(key)
    desc = {
        r.col_name: r.data_type
        for r in spark.sql(f"DESCRIBE FORMATTED {table}").collect()
    }
    if "EXTERNAL" not in desc.get("Type", ""):
        raise ValueError(
            f"replace_bucketed_table: {table} is {desc.get('Type')!r}, not "
            "EXTERNAL — DROP TABLE would delete its data directory mid-swap"
        )
    path = re.sub(r"^file:", "", desc["Location"])
    cols = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in frame.schema
    )
    tmp_tbl = f"{table}__compacting"
    tmp_path = f"{path.rstrip('/')}__compacting"
    spark.sql(f"DROP TABLE IF EXISTS {tmp_tbl}")
    shutil.rmtree(tmp_path, ignore_errors=True)
    shutil.rmtree(f"{path.rstrip('/')}__old", ignore_errors=True)
    write_bucketed(
        frame.repartition(n_buckets, *keys), tmp_tbl, keys, n_buckets,
        path=tmp_path,
    )
    _swap_in_side_copy(spark, table, tmp_tbl, path, cols, keys, n_buckets)


def sidecar_read_json(path: str) -> dict | None:
    """Read a 1-record JSON metadata sidecar; ``None`` when it is
    ABSENT or DETERMINISTICALLY unreadable (torn content, or the
    legacy 1-row-parquet directory form) — exactly the cases where
    every other reader of the same path fails the same way, so a
    caller that degrades to its bootstrap/re-derive stays consistent
    across processes. Transient I/O errors (an OSError on an existing,
    valid file) PROPAGATE — the ADVICE r15 narrowing: silently
    treating a transient failure as "absent" would let a replay read
    the valid-but-lower value later and fast-path unsoundly.

    Why JSON files and not 1-row parquet datasets (r16): the parquet
    form costs a FULL Spark job per read and per write — measured
    0.2–0.5 s each on this container — and the per-batch maintenance
    paths (replay_guard + raise_watermark + the LSH banding lookup)
    paid up to three of them per micro-batch. A local JSON read is
    ~0.1 ms, and ``os.replace`` gives atomicity the parquet overwrite
    never had (its mid-overwrite unreadable window disappears)."""
    import json

    try:
        with open(path) as f:
            return json.load(f)
    except FileNotFoundError:
        return None
    except (IsADirectoryError, ValueError):
        # directory = legacy parquet sidecar (pre-r16 generation);
        # ValueError covers torn/invalid JSON. Both deterministic.
        return None


def sidecar_write_json(path: str, payload: dict) -> None:
    """Atomically (re)write a JSON metadata sidecar: tmp + fsync +
    rename, so readers see the old record or the new one, never a torn
    file. The fsync (ADVICE r16) extends the guarantee from process
    crashes to power loss: without it a lost rename could leave a
    STALE-LOW watermark standing after the subsequent table append
    survived — the unsound direction ``replay_guard`` exists to close.
    The parent-dir fsync after the rename is best-effort (the rename's
    durability; a lost rename with a durable tmp is still just
    "old record visible", which every caller handles). A legacy
    parquet-directory sidecar at the same path is removed first (a
    crash between the two steps leaves the sidecar absent, which every
    caller treats as its bootstrap case — stale-never, the safe
    direction)."""
    import json

    if os.path.isdir(path):
        shutil.rmtree(path, ignore_errors=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(payload, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    try:
        dfd = os.open(os.path.dirname(path) or ".", os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)
    except OSError:
        pass


#: sentinel for "caller did not supply a precomputed value" (None is a
#: meaningful supplied value: a known-empty batch).
_UNSET = object()


def replay_guard(
    spark: SparkSession,
    table: str,
    new_rows: DataFrame,
    id_col: str,
    minmax=_UNSET,
) -> DataFrame:
    """O(delta) idempotence guard for standing-index appends (VERDICT
    r13 'minor, watch it': the *_index_append replay guards probed the
    FULL standing table's id column per micro-batch — a column-pruned
    scan, O(index) per batch at 10⁹ rows). Returns ``new_rows`` with
    ids the table already holds dropped.

    Mechanism: a max-id WATERMARK in a tiny JSON sidecar NEXT TO
    the table's own data directory (``<location>_rwm`` — no catalog
    entry, so externally-owned sessions never get a surprise managed
    table in their warehouse dir; JSON file, not a 1-row parquet
    dataset — see ``sidecar_read_json``, r16: the parquet form cost
    a Spark job per read/write on every micro-batch). Invariant — the watermark is always
    >= every id the standing table holds, because it is raised BEFORE
    the caller can append (and bootstraps from a one-time full max
    over the table, so pre-guard appends are covered). Ids ABOVE the
    watermark
    are therefore provably absent: the normal streaming batch (fresh,
    higher ids) passes through with ZERO index I/O — the input frame
    is returned as-is. Only ids at-or-below the watermark (a replay,
    or id reuse) pay the exact index-side semi-join, restricted to
    those suspects.

    Crash-safe in both directions: a crash AFTER the raise but BEFORE
    the append leaves the watermark stale-HIGH, which only widens the
    exact-check set (the retried batch's ids are <= wm, get checked
    against the table, found absent, and admitted — nothing lost); an
    absent or unreadable sidecar degrades to the bootstrap full-max
    path (and the atomic rename write means no reader can ever see a
    torn one). The guard is only sound if every append
    to ``table`` flows through it (or through a caller that raises the
    watermark first) — all three maintenance loops do. The sidecar's
    read-modify-write is SINGLE-WRITER (the foreachBatch driver loop
    the whole standing-index tier assumes): two concurrent appenders
    could interleave read/raise and leave the lower max standing.

    ``minmax`` (r17, VERDICT r16 item 2): precomputed
    (min_id, max_id) of ``new_rows`` — a caller that already paid a
    delta-sized agg passes it and the entirely-fresh fast path costs
    zero Spark jobs. Must describe EXACTLY ``new_rows``'s ``id_col``
    ((None, None) for a known-empty batch)."""
    if not spark.catalog.tableExists(table):
        return new_rows
    wm_path = _table_location(spark, table).rstrip("/") + "_rwm"
    # min rides the same single pass over the delta (r16): the normal
    # streaming batch is entirely-fresh (min > wm), which the min
    # proves WITHOUT a second suspects-empty? job — the fast path is
    # then exactly one delta-sized job plus two file touches. r17:
    # a caller that already aggregated the delta (the streaming loops
    # agg their persisted status frame) passes ``minmax`` and the fast
    # path costs ZERO jobs.
    if minmax is _UNSET:
        row = new_rows.agg(
            F.max(id_col).alias("mx"), F.min(id_col).alias("mn")
        ).collect()[0]
        mn, mx = row.mn, row.mx
    else:
        mn, mx = minmax
    if mx is None:  # empty batch
        return new_rows
    mx, mn = int(mx), int(mn)
    rec = sidecar_read_json(wm_path)
    wm = None if rec is None else int(rec["wm"])
    if wm is None:
        # bootstrap: one full (column-pruned) max over the standing
        # table, paid ONCE per table lifetime — covers ids appended
        # before the guard existed
        got = spark.table(table).agg(F.max(id_col)).collect()[0][0]
        wm = mx if got is None else max(mx, int(got))
        suspects = new_rows
        raise_to = wm
    else:
        suspects = new_rows.filter(F.col(id_col) <= F.lit(wm))
        raise_to = mx if mx > wm else None
    # raise the commitment BEFORE the caller can append (a write
    # failure propagates — soundness depends on the raise landing)
    if raise_to is not None:
        sidecar_write_json(wm_path, {"wm": int(raise_to)})
    # ADVICE r16: when mn <= wm the minimum-id row itself satisfies the
    # suspects filter, so "suspects empty?" is provably false — the old
    # limit(1).count() disjunct could never return 0 and only added one
    # wasted delta-sized job to every slow-path batch.
    if suspects is not new_rows and mn > wm:
        return new_rows  # the O(delta) fast path: zero index I/O
    ids = suspects.select(id_col)
    already = spark.table(table).select(id_col).join(ids, id_col, "left_semi")
    return new_rows.join(already, id_col, "left_anti")


def raise_watermark(
    spark: SparkSession,
    table: str,
    new_rows: DataFrame,
    id_col: str,
    max_id=_UNSET,
) -> None:
    """Unconditionally raise ``table``'s replay-guard watermark to
    cover ``new_rows`` BEFORE they are appended (ADVICE r14:
    ``replay_guard``'s soundness precondition — every append raises the
    watermark first — was documented but not enforced; an
    idempotent=False append of above-watermark ids left the watermark
    stale-LOW by caller mixing, so a later idempotent replay of those
    rows took the zero-I/O fast path and re-admitted duplicates). The
    ``*_index_append`` helpers call this on every non-guarded append.

    Only an EXISTING watermark is raised: while no sidecar exists the
    table has never been guard-checked, and ``replay_guard``'s
    bootstrap takes a full max over the table — which covers unguarded
    history exactly; writing a batch-local max here instead could land
    BELOW pre-existing ids (stale-LOW, the unsound direction). Raising
    is idempotent and stale-HIGH-safe, so a caller that already went
    through ``replay_guard`` (which raises) pays only one 1-row
    sidecar read and one delta-sized max.

    ``max_id`` (r17): precomputed max of ``new_rows``'s ``id_col``
    (None for a known-empty batch) — supplied by callers that already
    aggregated the delta (``lsh_index_append`` shares one stats pass
    across the gauge bump and this raise), making the raise job-free."""
    if not spark.catalog.tableExists(table):
        return
    wm_path = _table_location(spark, table).rstrip("/") + "_rwm"
    rec = sidecar_read_json(wm_path)
    # None = absent or deterministically unreadable (legacy/torn form):
    # replay_guard's own read fails the same way and bootstraps from
    # the full table max, so skipping the raise is safe. A TRANSIENT
    # failure on a valid existing file propagates out of
    # sidecar_read_json instead of silently skipping (ADVICE r15: the
    # later replay would read that valid stale-LOW value, fast-path,
    # and re-admit duplicates).
    if rec is None:
        return
    got = int(rec["wm"])
    mx = (
        new_rows.agg(F.max(id_col)).collect()[0][0]
        if max_id is _UNSET
        else max_id
    )
    if mx is not None and int(mx) > got:
        sidecar_write_json(wm_path, {"wm": int(mx)})


def compact_bucketed_table(
    spark: SparkSession, table: str, key: str | tuple[str, ...],
    n_buckets: int = _BUCKETS,
) -> dict:
    """Index COMPACTION (VERDICT r12 item 3): rewrite a standing
    bucketed table into exactly ONE file per occupied bucket, under the
    SAME bucket spec and at the SAME location — the maintenance pass
    that pays down the small-file debt ``mode="append"`` upkeep
    accrues (every lsh_index_append / ivf_index_append snapshot adds a
    file set per bucket, and after N snapshots the bucketed scan the
    layout exists to optimize opens N× the files and plans N× the
    row-group footers).

    Mechanics: the table is repartitioned ON ITS BUCKET KEYS into
    n_buckets tasks — Spark's repartition hash (pmod(murmur3(keys), n))
    IS the bucket-id function, so each task holds exactly one bucket
    and the bucketed writer emits exactly one file per occupied bucket
    (asserted by the caller's file-count check; per-bucket sort order
    is restored by the writer's sortBy). The rewrite lands at a side
    path, then swaps in: drop catalog entry, rename directories,
    re-attach with the same CLUSTERED BY DDL. The swap is a marker-file
    TWO-PHASE COMMIT (VERDICT r12: the bare DROP→rename→CREATE window
    lost the catalog entry on a mid-swap crash): a `__commit.json`
    marker carrying the replay DDL is written after the side copy is
    complete and before the first destructive step, and removed only
    after the re-attach — ``recover_compaction(spark, path)`` finishes
    (or rolls back, if the compacted generation is gone) any swap the
    marker says is in flight, so a crash at ANY point recovers to a
    queryable table with full content (crash-injection-tested in
    tests/test_sinks.py). Content is bit-identical and the spec
    unchanged — a co-located join is exchange-free before and after
    (property-tested in tests/test_sinks.py).

    The table must be EXTERNAL (every in-repo standing index is —
    write_bucketed attaches a LOCATION): DROP TABLE on a MANAGED
    bucketed table would delete the data directory out from under the
    rename (ADVICE r12), so that is refused up front.

    Returns {"files_before", "files_after", "rows"} so callers/SCALE
    ledgers can record the debt paid.
    """
    from mr_py_spark.sources.sinks import write_bucketed

    keys = [key] if isinstance(key, str) else list(key)
    desc = {
        r.col_name: r.data_type
        for r in spark.sql(f"DESCRIBE FORMATTED {table}").collect()
    }
    if "EXTERNAL" not in desc.get("Type", ""):
        raise ValueError(
            f"compact_bucketed_table: {table} is {desc.get('Type')!r}, not "
            "EXTERNAL — DROP TABLE would delete its data directory mid-swap"
        )
    path = re.sub(r"^file:", "", desc["Location"])
    files_before = len(_data_files(path))
    # read the FILES, not the catalog table: a bucketed-scan source
    # makes the planner elide the aligning repartition below (measured:
    # 92 files out instead of 32 — tasks were size-packed file groups,
    # several buckets each), while a plain parquet scan keeps it and
    # each write task holds exactly one bucket
    df = spark.read.parquet(path)
    cols = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)
    tmp_tbl = f"{table}__compacting"
    tmp_path = f"{path.rstrip('/')}__compacting"
    old_path = f"{path.rstrip('/')}__old"
    spark.sql(f"DROP TABLE IF EXISTS {tmp_tbl}")
    shutil.rmtree(tmp_path, ignore_errors=True)
    shutil.rmtree(old_path, ignore_errors=True)
    write_bucketed(
        df.repartition(n_buckets, *keys), tmp_tbl, keys, n_buckets, path=tmp_path
    )
    _swap_in_side_copy(spark, table, tmp_tbl, path, cols, keys, n_buckets)
    return {
        "files_before": files_before,
        "files_after": len(_data_files(path)),
        # counted AFTER the swap, on the compacted layout — an extra
        # pre-rewrite full scan over the fragmented files would double
        # compaction I/O for a statistic (review r12); content equality
        # is the caller's bit-identity check, not this count
        "rows": spark.table(table).count(),
    }


@register("lsh_index_compaction", tags=("B22", "C2", "A8"), oracle=None)
def lsh_index_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The small-file maintenance story for the standing-index tier,
    registered so the driver exercises it end-to-end: build a private
    LSH band index from a third of the fixture corpus, grow it with two
    ``lsh_index_append`` snapshots (each adds a file set per bucket —
    the debt), then ``compact_bucketed_table`` back to one file per
    occupied bucket under the same (band_id, band_key) spec. Emits the
    before/after file and row counts; the rows-must-survive invariant
    (rows_after == rows_before, files_after < files_before) plus
    bit-identical content and exchange-free-join preservation are
    property-tested in tests/test_sinks.py. Rows-only: file layout is
    engine-internal, no SQL oracle exists."""
    import tempfile as _tf

    from mr_py_spark.operators.dedup import (
        _LSH_INDEX_KEYS,
        lsh_index_append,
        lsh_band_entries,
        minhash_signatures,
    )
    from mr_py_spark.sources.sinks import write_bucketed

    # per-PROCESS table name and path: the demo rmtree/DROPs its own
    # workspace, and a shared fixed name would race a concurrent
    # session running the same registered query (review r12 — every
    # SHARED builder in this file locks; a throwaway demo isolates
    # instead)
    tag = (
        f"b{_BUCKETS}_"
        + re.sub(r"[^0-9a-zA-Z]+", "_", sf_dir.strip("/"))
        + f"_p{os.getpid()}"
    )
    table = f"mrps_lsh_compact_demo_{tag}"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    root = os.path.join(_tf.gettempdir(), _CACHE_ROOT_NAME, tag)
    path = os.path.join(root, "lsh_compact_demo")
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    docs = tbl(spark, sf_dir, "documents")
    part = F.col("doc_id") % 3
    write_bucketed(
        lsh_band_entries(minhash_signatures(docs.filter(part == 0))),
        table, _LSH_INDEX_KEYS, _BUCKETS, path=path,
    )
    for i in (1, 2):  # two maintenance snapshots -> 3 file sets/bucket
        lsh_index_append(docs.filter(part == i), table)
    # counted BEFORE the swap, over the fragmented layout — the emitted
    # rows-must-survive metric has to be a real before/after comparison
    # (ADVICE r12: stats["rows"] is deliberately post-swap, so using it
    # as rows_before made the comparison tautological)
    rows_before = spark.table(table).count()
    stats = compact_bucketed_table(spark, table, _LSH_INDEX_KEYS)
    rows_after = int(stats["rows"])
    spark.sql(f"DROP TABLE {table}")
    shutil.rmtree(root, ignore_errors=True)  # per-process workspace
    return spark.createDataFrame(
        [
            ("files_before", int(stats["files_before"])),
            ("files_after", int(stats["files_after"])),
            ("rows_before", int(rows_before)),
            ("rows_after", int(rows_after)),
        ],
        "metric string, value long",
    )


@register(
    "q5_bucketed",
    tags=("B22", "B19", "B21"),
    oracle="""
        SELECT n.n_name,
               CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(10,4))
                        * (1 - CAST(l.l_discount AS DECIMAL(10,4)))), 4) AS DOUBLE) AS revenue
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n.n_name
    """,
)
def q5_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 over the bucketed warehouse — identical answer to
    ``q5_local_supplier`` (same oracle, bitwise), different physical
    story: lineitem ⋈ orders runs as a co-bucketed sort-merge join with
    ZERO exchange on either fact side (plan-asserted in
    tests/test_plans.py), because both tables are bucketed+sorted on
    the order key at write time.

    Join order differs from q5_local_supplier for exactly that reason:
    the fact⋈fact join goes FIRST (while both sides still carry the
    bucket layout — a customer-side join would re-partition orders on
    custkey and forfeit it), with the region prune still applied
    map-side via the broadcast ASIA-supplier frame and the date filter
    pushed into the bucketed orders scan. The customer equality +
    nation-match then runs against the already-pruned joined fact:
    one shuffle total at scale (vs two in the shuffle form — and that
    one is over rows already cut to ASIA suppliers in the date range).
    The s/c nationkey match rides that join as a second equi-key, not
    a post-filter, so AQE sees the true join cardinality."""
    li_b = _bucketed_table(spark, sf_dir, "lineitem", "l_orderkey")
    o_b = _bucketed_table(spark, sf_dir, "orders", "o_orderkey")

    n = tbl(spark, sf_dir, "nation")
    r = tbl(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia = n.join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")).select(
        "n_nationkey", "n_name"
    )
    s = (
        tbl(spark, sf_dir, "supplier")
        .join(F.broadcast(asia), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    c = (
        tbl(spark, sf_dir, "customer")
        .join(
            F.broadcast(asia.select("n_nationkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", "c_nationkey")
    )
    li = li_b.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    o = o_b.filter(
        (F.col("o_orderdate") >= ts_ntz("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < ts_ntz("1998-01-01 00:00:00"))
    ).select("o_orderkey", "o_custkey")
    # broadcast joins preserve the streamed side's bucket partitioning,
    # so li_asia still satisfies hashpartitioning(l_orderkey, _BUCKETS)
    li_asia = li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
    fact = li_asia.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    return (
        fact.join(
            c,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(
                    dec4("l_extendedprice")
                    * (F.lit(1).cast("decimal(10,4)") - dec4("l_discount"))
                ),
                4,
            )
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "q3_bucketed",
    tags=("B22", "B19", "B11"),
    oracle="""
        SELECT l.l_orderkey,
               CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(10,4))
                        * (1 - CAST(l.l_discount AS DECIMAL(10,4)))), 4) AS DOUBLE) AS revenue,
               strftime(o.o_orderdate, '%Y-%m-%d %H:%M:%S')          AS order_date,
               o.o_orderpriority
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l.l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue DESC, l.l_orderkey
        LIMIT 10
    """,
)
def q3_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 over the bucketed warehouse — same oracle and bitwise
    answer as ``q3_shipping_priority``, with the lineitem ⋈ orders
    join running exchange-free on the bucket layout.

    The key observation enabling the reorder: Q3 emits NO customer
    column — customer is purely a membership filter (each order has
    exactly one customer, so the inner join neither duplicates nor
    needs customer attributes). The shuffle form must join customer
    into orders FIRST (broadcast at small sf), which would re-
    partition orders on custkey and forfeit the bucket layout here;
    instead the fact ⋈ fact join goes first (zero exchange, both
    sides date-pruned at the scan) and the BUILDING-customer
    membership applies after as a LEFT SEMI on o_custkey — AQE
    broadcasts the segment-filtered key set at small sf, and at
    100 TB it is one shuffle of the already doubly-date-filtered
    joined fact (Q3's filters are the selective ones). Top-10 stays
    TakeOrderedAndProject. Plan-asserted in tests/test_plans.py."""
    li_b = _bucketed_table(spark, sf_dir, "lineitem", "l_orderkey")
    o_b = _bucketed_table(spark, sf_dir, "orders", "o_orderkey")

    li = li_b.filter(F.col("l_shipdate") > ts_ntz("1998-01-01 00:00:00")).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = o_b.filter(F.col("o_orderdate") < ts_ntz("1998-01-01 00:00:00")).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    c = (
        tbl(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    fact = li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    one = F.lit(1).cast("decimal(10,4)")
    revenue = F.round(
        F.sum(dec4("l_extendedprice") * (one - dec4("l_discount"))), 4
    ).cast("double")
    return (
        fact.join(c, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue.alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            "revenue",
            fmt_ts("o_orderdate").alias("order_date"),
            "o_orderpriority",
        )
    )
