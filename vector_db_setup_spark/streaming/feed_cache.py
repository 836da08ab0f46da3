"""Cycle-scoped CDC feed sharing for subscriber maintainers.

A maintenance cycle drains every subscriber of one snapshot table —
Bloom, IVF, incremental aggregate, n-gram LM, perplexity histogram,
DSIR, LSH index, span index — and each drain asks ``snapshot_changes``
for the SAME source commits, differing only in which columns count as
content and how changes are encoded. Feed assembly is the drain's
dominant fixed cost (the r11 ppl-histogram experiment measured the
per-drain protocol overhead at ~6-7 s at fixture scale, most of it
eager guard jobs inside assembly), so a 7-subscriber cycle paid it 7×
for one set of commits (VERDICT r11, What's-wrong #2).

This module assembles the pair-encoded change feed ONCE per
(source, key, version-range) per cycle — with ``columns=None`` (compare
every shared column) and every non-key column carried — persists it,
and derives each maintainer's narrower feed from the shared relation:

- **op contract**: the shared feed is assembled WITHOUT ``allowed_ops``
  (consumers disagree); each consumer's own contract is enforced by
  ``snapshot_table.check_range_ops`` before derivation, so
  ``DisallowedOpError`` timing and type are unchanged (self-healing
  ``on_rewrite="rebuild"`` maintainers still catch it).
- **change-set narrowing**: the shared feed detects a change on ANY
  column; a consumer comparing only columns C must not see a key whose
  rewrite left C untouched. Same-version removed/added pairs that are
  null-safe-equal on C are dropped (both halves) — an O(batch)
  self-join on (key, version), exactly reproducing the narrow feed's
  "merge that rewrote only un-indexed columns produces no work"
  contract. ``columns=[]`` (key-presence) drops ALL pairs.
- **encoding**: ``"pair"`` consumers get the narrowed pairs verbatim;
  ``"changed"`` consumers get each surviving pair collapsed to one
  'changed' row carrying the post-image (the added half relabeled, the
  removed half dropped).
- **projection**: the consumer's ``carry_columns`` subset, in its
  order — image semantics ride along (removed rows carry pre-images,
  added/changed rows post-images, inherited from the shared assembly).

SUB-RANGE COVER: cursor-divergent subscribers share too — a feed is a
union of per-version step attributions (every row stamped with the
commit that introduced it), so a request for (from, to] inside an
already-assembled (a, b] derives by a version filter, zero extra
assembly (``cover_hits`` in the counters). Order matters: the widest
range must be requested first to cover the rest; a wider-after-narrow
request assembles its own feed. ``maintenance_cycle`` removes the
ordering hazard by PREWARMING the union (min subscriber cursor, head]
range before any drain runs (``prewarm``), so one assembly per key
column is deterministic even when ``parallel_drains`` randomizes which
drain reaches the cache first.

FALLBACK: if the shared assembly itself fails (e.g. a merge_schema
boundary where carrying every column is impossible, or a GC'd range),
the range is marked failed and every request passes through to a
verbatim narrow ``snapshot_changes`` call — behavior identical to no
cache, including the error the consumer would have seen.

SCOPE: the active caches live in a module-global registry (not
thread-local, because drains apply inside streaming foreachBatch
threads), keyed by the cycle's source-table path. Concurrent cycles
over DIFFERENT tables — a scheduler maintaining several independent
snapshot tables in one process — each get their own cache (ADVICE
r12: this used to hard-fail on the second cycle); nested or
concurrent cycles on the SAME scope share one refcounted cache whose
persisted feeds are freed only when the last cycle exits. Scoping is
by the exact ``base`` string the cycle was opened with — a drain
spelling the source path differently simply misses the cache and
runs its verbatim narrow call (correct, just unshared). A bare
``cycle()`` registers a wildcard scope serving every source (the
standalone/test form); per-base scopes take precedence over it.
Outside any active cycle ``cdc_changes`` is a pass-through.

COST SHAPE of carrying every column: the shared feed moves the DELTA
(batch dirs + pruned pre-image probes), so the extra columns cost
O(ingest batch), never O(corpus) — the right trade when subscribers
collectively touch most columns (the curation deployment: text +
groups + values + embeddings). A source dominated by a huge payload
column NO subscriber consumes (multimodal blobs) pays to ship those
bytes once per cycle; keep such payloads in their own table (the
multimodal/columns.py layout guidance) or run those drains outside
the cycle (pass-through narrows per consumer).
"""

from __future__ import annotations

import contextlib
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# scope (source base path, or None = wildcard) -> [cache, refcount];
# every mutation AND lookup under _REGISTRY_LOCK, so cycle activation
# is atomic (VERDICT r12) and a cache is never observed half-installed
_REGISTRY: dict[str | None, list] = {}
_REGISTRY_LOCK = threading.Lock()


def _active_cache_for(base: str) -> "CycleFeedCache | None":
    with _REGISTRY_LOCK:
        entry = _REGISTRY.get(base) or _REGISTRY.get(None)
        return entry[0] if entry is not None else None


def _fs_key(fs) -> int | None:
    return None if fs is None else id(fs)


class CycleFeedCache:
    """Shared-assembly cache for one maintenance cycle. Counters
    (`assemblies`, `requests`, `fallbacks`) feed the cycle report —
    a cycle should LOG how much assembly it shared, not just run."""

    def __init__(self) -> None:
        self._supersets: dict[tuple, tuple[DataFrame, list[str]]] = {}
        self._failed: set[tuple] = set()
        self._ops_ok: set[tuple] = set()
        # one lock over derivation state: parallel drains
        # (maintenance_cycle(parallel_drains=N)) must not race the
        # dicts, and the FIRST requester of a range assembles while
        # the rest wait instead of duplicating the eager guard jobs —
        # the consumers' expensive work (state rewrite, read-back)
        # happens outside the lock, on the returned lazy DataFrames
        self._lock = threading.Lock()
        self.assemblies = 0
        self.requests = 0
        self.fallbacks = 0
        self.cover_hits = 0

    def close(self) -> None:
        for df, _ in self._supersets.values():
            try:
                df.unpersist()
            except Exception:
                pass  # session torn down mid-cycle: nothing to free
        self._supersets.clear()

    # -- op contract (per consumer, memoized per distinct contract) --

    def _check_ops(
        self, spark, base, from_v, to_v, allowed_ops, fs
    ) -> None:
        if allowed_ops is None:
            return
        from vector_db_setup_spark.sources import snapshot_table as st

        key = (base, from_v, to_v, tuple(allowed_ops), _fs_key(fs))
        if key in self._ops_ok:
            return
        st.check_range_ops(
            spark, base, from_v, to_v, allowed_ops, fs=fs
        )
        self._ops_ok.add(key)

    # -- shared assembly --

    def _superset(
        self, spark, base, key_col, from_v, to_v, fs
    ) -> tuple[DataFrame, list[str]] | None:
        from vector_db_setup_spark.sources import snapshot_table as st

        skey = (base, key_col, from_v, to_v, _fs_key(fs))
        if skey in self._failed:
            return None
        hit = self._supersets.get(skey)
        if hit is not None:
            return hit
        # SUB-RANGE cover: a feed is a union of per-version step
        # attributions (every row stamped with the commit that
        # introduced it — the coalesced append/delete runs stamp
        # per-version too), so feed(a, b] filtered to
        # from_v < version <= to_v IS feed(from_v, to_v] row-for-row.
        # This lets a cursor-divergent subscriber (a laggard, or a
        # fresh bootstrap draining a wider range first) share the
        # assembly instead of forcing its own. The covering range's
        # assembly already proved the chain dense, so any integer
        # sub-bound names a committed version.
        for (b2, k2, f2, t2, fk2), (feed, cols) in self._supersets.items():
            if (
                (b2, k2, fk2) == (base, key_col, _fs_key(fs))
                and f2 <= from_v
                and to_v <= t2
            ):
                sub = feed.filter(
                    (F.col("version") > from_v)
                    & (F.col("version") <= to_v)
                )
                self._supersets[skey] = (sub, cols)
                self.cover_hits += 1
                return sub, cols
        try:
            carry_all = [
                c
                for c in st.read_snapshot(
                    spark, base, version=to_v, fs=fs
                ).columns
                if c != key_col
            ]
            if any(c in ("status", "version") for c in carry_all):
                # the source owns the feed's contract names: a shared
                # assembly can't carry them — serve this range narrow
                raise ValueError("source column shadows feed contract")
            feed = st.snapshot_changes(
                spark,
                base,
                key_col,
                from_version=from_v,
                to_version=to_v,
                fs=fs,
                columns=None,  # compare every shared column
                carry_columns=carry_all,
                allowed_ops=None,  # per-consumer, via check_range_ops
                change_encoding="pair",
            ).persist()
        except st.DisallowedOpError:
            raise  # impossible (allowed_ops=None); never mask it
        except Exception:
            # merge_schema boundary, GC'd range, carry gap … — the
            # narrow per-consumer call reproduces the exact behavior
            # (including the error) the consumer contracts on
            self._failed.add(skey)
            return None
        self.assemblies += 1
        self._supersets[skey] = (feed, carry_all)
        return feed, carry_all

    # -- up-front union assembly --

    def prewarm(self, spark, base, subscriber_states, fs=None) -> int:
        """Assemble the UNION range the cycle's subscribers will need,
        BEFORE any drain runs: read each subscriber state's cursor and
        key column from its newest marker meta and assemble
        (min cursor, head] once per key column. This makes
        ``feed_assemblies == 1`` deterministic under
        ``parallel_drains`` — without it, whichever drain wins the
        cache lock assembles first, so a laggard losing the race to a
        head-cursor subscriber pays a second assembly for its wider
        range in some runs and none in others (VERDICT r12). Strictly
        best-effort and semantics-free: an unreadable or cursor-less
        state is skipped (its drain assembles on demand, exactly as
        before), and derivation never consults anything prewarm wrote
        beyond the ordinary superset entries. Returns the number of
        ranges assembled."""
        from vector_db_setup_spark.sources import snapshot_table as st

        try:
            vs = st.committed_versions(spark, base, fs)
        except Exception:
            return 0  # source missing/unreadable: drains will say why
        if not vs:
            return 0
        head = max(vs)
        froms: dict[str, int] = {}
        for state in subscriber_states or []:
            try:
                svs = st.committed_versions(spark, state, fs)
                if not svs:
                    continue  # unbootstrapped: first drain reads head
                meta = (
                    st.snapshot_info(spark, state, max(svs), fs).get(
                        "meta"
                    )
                    or {}
                )
            except Exception:
                continue
            key = meta.get("key_col")
            src = meta.get("source_base")
            if not key or (src is not None and src != base):
                continue
            # same cursor semantics as snapshot_table.subscriber_cursor
            if "through_version" in meta:
                cur = int(meta["through_version"])
            elif (
                meta.get("source_appended_through") is not None
                and meta.get("source_deleted_through") is not None
            ):
                cur = min(
                    int(meta["source_appended_through"]),
                    int(meta["source_deleted_through"]),
                )
            else:
                continue
            froms[key] = min(froms.get(key, cur), cur)
        warmed = 0
        with self._lock:
            for key, from_v in froms.items():
                if from_v < head and (
                    self._superset(spark, base, key, from_v, head, fs)
                    is not None
                ):
                    warmed += 1
        return warmed

    # -- derivation --

    def changes(
        self,
        spark: SparkSession,
        base: str,
        key_col: str,
        from_version: int,
        to_version: int | None,
        fs=None,
        columns: list[str] | None = None,
        carry_columns: list[str] | None = None,
        allowed_ops=None,
        change_encoding: str = "changed",
    ) -> DataFrame:
        with self._lock:
            return self._changes_locked(
                spark, base, key_col, from_version, to_version,
                fs=fs, columns=columns, carry_columns=carry_columns,
                allowed_ops=allowed_ops, change_encoding=change_encoding,
            )

    def _changes_locked(
        self,
        spark: SparkSession,
        base: str,
        key_col: str,
        from_version: int,
        to_version: int | None,
        fs=None,
        columns: list[str] | None = None,
        carry_columns: list[str] | None = None,
        allowed_ops=None,
        change_encoding: str = "changed",
    ) -> DataFrame:
        from vector_db_setup_spark.sources import snapshot_table as st

        self.requests += 1
        if to_version is None:
            # pin "head" NOW: the cache key must name a fixed range —
            # two head-relative requests straddling a source commit
            # must not silently share one assembly
            vs = st.committed_versions(spark, base, fs)
            to_version = vs[-1] if vs else 0
        self._check_ops(
            spark, base, from_version, to_version, allowed_ops, fs
        )
        got = self._superset(
            spark, base, key_col, from_version, to_version, fs
        )
        if got is None:
            self.fallbacks += 1
            return st.snapshot_changes(
                spark,
                base,
                key_col,
                from_version=from_version,
                to_version=to_version,
                fs=fs,
                columns=columns,
                carry_columns=carry_columns,
                allowed_ops=None,  # already checked above
                change_encoding=change_encoding,
            )
        feed, carry_all = got
        carry = [c for c in (carry_columns or []) if c != key_col]
        compare = carry_all if columns is None else list(columns)
        dtypes = dict(feed.dtypes)
        if any(dtypes.get(c, "").startswith("map<") for c in compare):
            # Spark defines no equality (eqNullSafe) over MapType, so
            # the pair-narrowing join can't evaluate — serve narrow
            # (snapshot_changes hashes maps through its own path)
            self.fallbacks += 1
            return st.snapshot_changes(
                spark, base, key_col,
                from_version=from_version, to_version=to_version,
                fs=fs, columns=columns, carry_columns=carry_columns,
                allowed_ops=None, change_encoding=change_encoding,
            )
        if not (
            set(compare) <= set(carry_all)
            and set(carry) <= set(carry_all)
        ):
            # a consumer naming a column the head schema lacks: the
            # narrow call raises its own contract error — reproduce it
            self.fallbacks += 1
            return st.snapshot_changes(
                spark, base, key_col,
                from_version=from_version, to_version=to_version,
                fs=fs, columns=columns, carry_columns=carry_columns,
                allowed_ops=None, change_encoding=change_encoding,
            )
        out = feed
        k, v = F.col(key_col), F.col("version")
        if set(compare) != set(carry_all):
            # drop same-version pairs that are null-safe-equal on the
            # consumer's compare set — for columns=[] that is EVERY
            # pair (presence unchanged). O(batch) self-join.
            pre = out.filter(F.col("status") == "removed").select(
                k, v, *[F.col(c).alias(f"_pre{i}")
                        for i, c in enumerate(compare)]
            )
            post = out.filter(F.col("status") == "added").select(
                k, v, *[F.col(c).alias(f"_post{i}")
                        for i, c in enumerate(compare)]
            )
            noop = pre.join(post, [key_col, "version"])
            for i in range(len(compare)):
                noop = noop.filter(
                    F.col(f"_pre{i}").eqNullSafe(F.col(f"_post{i}"))
                )
            out = out.join(
                noop.select(key_col, "version"),
                [key_col, "version"],
                "left_anti",
            )
        if change_encoding == "changed":
            # collapse each surviving pair to one 'changed' row
            # carrying the post-image (the narrow feed's display form)
            pair_keys = (
                out.filter(F.col("status") == "removed")
                .select(key_col, "version")
                .join(
                    out.filter(F.col("status") == "added").select(
                        key_col, "version"
                    ),
                    [key_col, "version"],
                )
                .withColumn("_is_pair", F.lit(True))
            )
            out = (
                out.join(pair_keys, [key_col, "version"], "left")
                .filter(
                    ~(
                        (F.col("status") == "removed")
                        & F.col("_is_pair").isNotNull()
                    )
                )
                .withColumn(
                    "status",
                    F.when(
                        (F.col("status") == "added")
                        & F.col("_is_pair").isNotNull(),
                        F.lit("changed"),
                    ).otherwise(F.col("status")),
                )
            )
        return out.select(
            k, *[F.col(c) for c in carry], F.col("status"), v
        )


def cdc_changes(
    spark: SparkSession,
    base: str,
    key_col: str,
    from_version: int,
    to_version: int | None,
    fs=None,
    columns: list[str] | None = None,
    carry_columns: list[str] | None = None,
    allowed_ops=None,
    change_encoding: str = "changed",
) -> DataFrame:
    """The maintainers' feed entry point: inside an active cycle whose
    scope covers ``base`` (exact-path scope, else the wildcard) the
    shared-assembly cache serves the request; otherwise a verbatim
    ``snapshot_changes`` call — standalone drains are unchanged."""
    cache = _active_cache_for(base)
    if cache is not None:
        return cache.changes(
            spark, base, key_col, from_version, to_version,
            fs=fs, columns=columns, carry_columns=carry_columns,
            allowed_ops=allowed_ops, change_encoding=change_encoding,
        )
    from vector_db_setup_spark.sources import snapshot_table as st

    return st.snapshot_changes(
        spark, base, key_col,
        from_version=from_version, to_version=to_version,
        fs=fs, columns=columns, carry_columns=carry_columns,
        allowed_ops=allowed_ops, change_encoding=change_encoding,
    )


@contextlib.contextmanager
def cycle(base: str | None = None):
    """Activate a CycleFeedCache scoped to ``base`` for the duration
    (registry is module-global so foreachBatch threads see it; see the
    module docstring's SCOPE section). ``base=None`` registers the
    wildcard scope serving every source. Activation is atomic, and
    the registry is refcounted per scope: concurrent cycles over
    different tables are independent (they used to hard-fail —
    ADVICE r12), while nested/concurrent cycles on the same scope
    share ONE cache whose persisted feeds are freed only when the
    LAST holder exits — an outer close() must never unpersist feeds
    an inner cycle still references."""
    with _REGISTRY_LOCK:
        entry = _REGISTRY.get(base)
        if entry is None:
            entry = [CycleFeedCache(), 0]
            _REGISTRY[base] = entry
        entry[1] += 1
        cache = entry[0]
    try:
        yield cache
    finally:
        with _REGISTRY_LOCK:
            entry[1] -= 1
            last = entry[1] == 0
            if last:
                _REGISTRY.pop(base, None)
        if last:
            cache.close()
