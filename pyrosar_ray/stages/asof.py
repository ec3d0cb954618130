"""As-of / interval join with priority tiers — the OSV.match semantics.

Reference (pyroSAR S1/auxil.py:545-587): for an acquisition time ``t``
pick the orbit file whose validity interval covers ``t`` (start<=t<=stop),
restricted to the matching sensor, preferring the POE tier over RES, and
breaking ties by the maximum publish date. The engine adds a final
deterministic tie-break (minimum osv_id) so N-node and 4N-node runs
agree (SURVEY.md §7.4-2).

Physical plan: the file inventory is the SMALL side (thousands of rows
for years of acquisitions), so it is broadcast once via ``ray.put`` and
every map_batches actor builds the lookup index in ``__init__`` — no
shuffle touches the big side. Per-probe cost is O(1): intervals have a
fixed duration (derive.OSV_DURATION), so the candidate set for ``t`` is
the contiguous ``searchsorted`` window ``start ∈ (t-dur, t]``, and the
best candidate inside any window comes from a sparse-table
range-maximum index built once per actor.

Partitioning assumption: broadcast requires the inventory to fit in
worker memory. If it ever doesn't, range-partition BOTH sides by
``floor(t / dur)`` (each probe's candidates live in its own or the
previous bucket → duplicate inventory rows into their successor bucket,
join per partition with the same index) — documented here per the
custom-operator rule.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset


class _TierIndex:
    """Sorted interval starts + RMQ over (publish, -id) for one (sensor, tier)."""

    def __init__(self, start: np.ndarray, publish: np.ndarray, ids: np.ndarray):
        order = np.argsort(start, kind="stable")
        self.start = start[order]
        self.ids = ids[order]
        # Orderable key via a dense rank instead of an arithmetic composite
        # (publish*(1<<21)-id overflows / inverts for large ids or sub-second
        # publish units): lexsort by (publish desc, id asc) and take the
        # NEGATED rank, so argmax(key) = max publish then min id for any
        # int/float publish domain and unbounded ids.
        pub = publish[order]
        # dense-rank publish first so negation can't overflow any dtype
        _, pub_rank = np.unique(pub, return_inverse=True)
        best_first = np.lexsort((ids[order], -pub_rank))
        rank = np.empty(len(best_first), dtype=np.int64)
        rank[best_first] = np.arange(len(best_first), dtype=np.int64)
        key = -rank
        n = len(key)
        levels = max(1, int(np.floor(np.log2(n))) + 1) if n else 1
        # sparse table of argmax indices: st[k][i] = argmax key over [i, i+2^k)
        st = [np.arange(n, dtype=np.int64)]
        size = 1
        for _ in range(1, levels):
            prev = st[-1]
            m = n - size * 2 + 1
            if m <= 0:
                break
            left = prev[:m]
            right = prev[size : size + m]
            take_right = key[right] > key[left]
            st.append(np.where(take_right, right, left))
            size *= 2
        self.key = key
        self.st = st

    def query(self, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
        """Vectorized argmax of key over [lo, hi); -1 where empty."""
        out = np.full(len(lo), -1, dtype=np.int64)
        width = hi - lo
        nonempty = width > 0
        if not nonempty.any():
            return out
        lo_, hi_, w = lo[nonempty], hi[nonempty], width[nonempty]
        k = np.floor(np.log2(w)).astype(np.int64)
        k = np.minimum(k, len(self.st) - 1)
        size = np.int64(1) << k
        # gather the two overlapping 2^k windows per probe
        a = np.empty(len(lo_), dtype=np.int64)
        b = np.empty(len(lo_), dtype=np.int64)
        for kk in np.unique(k):
            m = k == kk
            tab = self.st[int(kk)]
            a[m] = tab[lo_[m]]
            b[m] = tab[hi_[m] - size[m]]
        best = np.where(self.key[b] > self.key[a], b, a)
        out[nonempty] = best
        return out


class IntervalInventory:
    """Broadcastable fixed-duration interval inventory with priority tiers."""

    def __init__(self, table: pa.Table, duration: int, tiers: tuple[str, ...] = ("POE", "RES")):
        self.duration = duration
        self.tiers = tiers
        self.index: dict[tuple[str, str], _TierIndex] = {}
        sensor = np.asarray(table["sensor"].to_pandas(), dtype=object)
        tier = np.asarray(table["osv_type"].to_pandas(), dtype=object)
        start = table["start_sec"].to_numpy()
        publish = table["publish_sec"].to_numpy()
        ids = table["osv_id"].to_numpy()
        for s in np.unique(sensor):
            for t in tiers:
                m = (sensor == s) & (tier == t)
                if m.any():
                    self.index[(str(s), t)] = _TierIndex(start[m], publish[m], ids[m])

    def match(self, sensors: np.ndarray, t: np.ndarray) -> np.ndarray:
        """Best covering osv_id per probe (POE preferred, max publish, min id);
        -1 where no interval covers t."""
        out = np.full(len(t), -1, dtype=np.int64)
        sensors = np.asarray(sensors, dtype=object)
        for s in np.unique(sensors):
            smask = sensors == s
            ts = t[smask]
            res = np.full(len(ts), -1, dtype=np.int64)
            for tier in self.tiers:
                idx = self.index.get((str(s), tier))
                if idx is None:
                    continue
                todo = res == -1
                if not todo.any():
                    break
                tt = ts[todo]
                # candidates: start in (t - duration, t]  ⇔  start<=t<=stop
                lo = np.searchsorted(idx.start, tt - self.duration, side="left")
                hi = np.searchsorted(idx.start, tt, side="right")
                pos = idx.query(lo, hi)
                found = pos >= 0
                vals = np.full(len(tt), -1, dtype=np.int64)
                vals[found] = idx.ids[pos[found]]
                res[todo] = vals
            out[smask] = res
        return out


def overlap_mask(
    start1: np.ndarray, stop1: np.ndarray, start2: np.ndarray, stop2: np.ndarray
) -> np.ndarray:
    """Vectorized interval-overlap predicate: start2 < stop1 AND stop2 > start1
    (reference: OSV.catch candidate filter, S1/auxil.py:276-278)."""
    return (np.asarray(start2) < np.asarray(stop1)) & (
        np.asarray(stop2) > np.asarray(start1)
    )


def asof_match(
    probes: Dataset,
    inventory: pa.Table,
    duration: int,
    sensor_col: str = "sensor",
    time_col: str = "t_sec",
    out_col: str = "osv_id",
    concurrency=4,
) -> Dataset:
    """Append the best-matching interval id to every probe row.

    Actor-pool stage: the inventory is ``ray.put`` once; each actor builds
    the searchsorted+RMQ index in ``__init__`` and matches whole batches
    vectorized in ``__call__``. Unmatched rows get ``osv_id = -1``
    (reference returns None and falls back to RES, S1/auxil.py:576-587).

    ``concurrency`` defaults to a FIXED pool of 4: the index build is
    ~2 ms, so the autoscaling ramp-up of ``(1, 4)`` only serialized the
    first batches (measured 2.2-2.9 s vs 1.9-2.3 s at sf0.1; the r2
    driver's 4.0 s reading was host noise — interleaved repeats sit at
    r1's level).
    """
    ref = ray.put(inventory)

    class _Match:
        def __init__(self):
            self.inv = IntervalInventory(ray.get(ref), duration)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = self.inv.match(
                np.asarray(batch[sensor_col].to_pandas(), dtype=object),
                batch[time_col].to_numpy(),
            )
            return batch.append_column(out_col, pa.array(ids, type=pa.int64()))

    return probes.map_batches(_Match, batch_format="pyarrow", concurrency=concurrency)


# ------------------------------------------------- inventory maintenance


def osv_extreme_date(
    files: Dataset,
    osvtype: str = "POE",
    datetype: str = "stop",
    extreme: str = "max",
    name_col: str = "filename",
) -> str | None:
    """Latest/earliest stamp among EOF files of one orbit type.

    Engine twin of ``OSV.maxdate``/``mindate`` (S1/auxil.py:507-544)
    over a filename Dataset instead of a directory walk: parse the
    grammar per batch, reduce to one stamp per block, min/max the
    block partials — a tree aggregate; stamps compare lexicographically.
    Returns None when no file of the type exists.
    """
    import pandas as pd

    from ..functions.osv import parse_osv_batch

    if extreme not in ("max", "min"):
        raise ValueError("extreme must be 'max' or 'min'")

    def _partial(batch: pa.Table) -> pa.Table:
        df = parse_osv_batch(batch[name_col].to_pandas())
        sel = df[df["type"] == f"{osvtype}ORB"][datetype].dropna()
        if sel.empty:
            return pa.table({"stamp": pa.array([], type=pa.string())})
        agg = sel.max() if extreme == "max" else sel.min()
        return pa.table({"stamp": pa.array([agg], type=pa.string())})

    partials = files.map_batches(_partial, batch_format="pyarrow").take_all()
    stamps = [r["stamp"] for r in partials]
    if not stamps:
        return None
    return max(stamps) if extreme == "max" else min(stamps)


def clean_res(files: Dataset, name_col: str = "filename") -> Dataset:
    """Drop RES files superseded by POE coverage.

    Reference ``OSV.clean_res`` (S1/auxil.py:480-489): delete every RES
    file whose stop stamp is before the latest POE stop. The engine
    returns the retained Dataset (the caller owns deletion); the POE
    max is ONE broadcast scalar, the filter is a vectorized per-batch
    mask — no shuffle.
    """
    from ..functions.osv import parse_osv_batch

    maxdate_poe = osv_extreme_date(files, "POE", "stop", "max", name_col)
    if maxdate_poe is None:
        return files

    def _keep(batch: pa.Table) -> pa.Table:
        df = parse_osv_batch(batch[name_col].to_pandas())
        drop = (df["type"] == "RESORB") & (df["stop"] < maxdate_poe)
        return batch.filter(pa.array((~drop).fillna(True).to_numpy(dtype=bool)))

    return files.map_batches(_keep, batch_format="pyarrow")


class _AsofProbe:
    """Per-actor composite-key searchsorted index for asof_join_backward."""

    def __init__(
        self, ref, on: str, right_on: str, by: str, value_cols: tuple[str, ...]
    ):
        right: pa.Table = ray.get(ref)
        df = right.to_pandas().sort_values([by, right_on], kind="mergesort")
        self.keys = np.sort(df[by].unique().astype(np.int64))
        codes = np.searchsorted(self.keys, df[by].to_numpy(dtype=np.int64))
        ts = df[right_on].to_numpy(dtype=np.int64)
        self.tmin = int(ts.min())
        span = int(ts.max()) - self.tmin + 1
        self.shift = max(span.bit_length(), 1)
        if (len(self.keys) << self.shift) < 0:  # pragma: no cover
            raise ValueError("key cardinality x time span overflows int64")
        # one globally sorted composite: (key code << shift) | (ts - tmin)
        self.comp = (codes << self.shift) | (ts - self.tmin)
        self.vals = {c: df[c].to_numpy() for c in value_cols}
        self.on, self.by, self.value_cols = on, by, value_cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        lts = batch[self.on].combine_chunks().cast(pa.int64()).to_numpy()
        lby = batch[self.by].combine_chunks().cast(pa.int64()).to_numpy()
        pos = np.searchsorted(self.keys, lby)
        pos_c = np.clip(pos, 0, max(len(self.keys) - 1, 0))
        known = (self.keys[pos_c] == lby) if len(self.keys) else np.zeros(len(lby), bool)
        tnorm = np.clip(lts - self.tmin, -1, (1 << self.shift) - 1)
        probe = (pos_c << self.shift) | np.maximum(tnorm, 0)
        idx = np.searchsorted(self.comp, probe, side="right") - 1
        idx_c = np.maximum(idx, 0)
        # hit iff the found row belongs to the same key and rts <= lts
        hit = (
            known
            & (idx >= 0)
            & ((self.comp[idx_c] >> self.shift) == pos_c)
            & (tnorm >= 0)
        )
        import pyarrow.compute as pc

        out = {name: batch[name] for name in batch.column_names}
        hit_arr = pa.array(hit)
        for c in self.value_cols:
            arr = pa.array(self.vals[c][idx_c])
            out[c] = pc.if_else(hit_arr, arr, pa.nulls(len(arr), arr.type))
        return pa.table(out)


def asof_join_backward(
    left: Dataset,
    right: Dataset,
    on: str,
    by: str,
    right_on: str | None = None,
    value_cols: tuple[str, ...] = ("state",),
    concurrency: tuple[int, int] | int = (1, 8),
) -> Dataset:
    """Generic backward as-of LEFT join: for every left row, append the
    value columns of the LATEST right row with ``r[on] <= l[on]`` and
    the same ``by`` key (DuckDB/pandas ``ASOF JOIN`` semantics);
    left rows with no predecessor carry nulls.

    Physical plan: the right side is the SMALL state table (device
    registry, price history, orbit inventory — catalog-sized by
    contract); it broadcasts once via ``ray.put`` and each actor builds
    ONE globally-sorted composite index ``(key_code << shift) | ts`` in
    ``__init__``, so every probe batch is a single vectorized
    searchsorted — no exchange ever touches the left stream. If the
    right side outgrows workers, range-partition both sides on ``on``
    and duplicate each right partition's last-per-key row into the next
    bucket (same stitch contract as the ranged sessionizer).

    ``on`` columns must be integer (epoch µs); keys must be integers.
    ``right_on`` names the right side's time column (defaults to ``on``).
    """
    ref = ray.put(pa.concat_tables(ray.get(right.to_arrow_refs())))
    return left.map_batches(
        _AsofProbe,
        fn_constructor_args=(ref, on, right_on or on, by, tuple(value_cols)),
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=8192,
    )
