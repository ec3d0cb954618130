"""Deterministic derivation of spatial test tables from the TPC-H-ish parquet.

The driver's correctness gate runs each Ray pipeline side-by-side with an
ANSI-SQL oracle over the same parquet views (region nation customer
supplier part orders lineitem events documents embeddings). The spatial
engine, however, operates on *scene footprints* and *points* — so both
sides derive those deterministically from the base tables using identical
integer arithmetic followed by exact IEEE double ops. The numpy kernels
here and the SQL snippets in ``__ray_entry__.oracle_sql`` are two
renderings of the same formulas; tests assert they agree bit-for-bit.

Scene model mirrors the reference catalog schema
(pyroSAR/archive.py:374-394): identity key (outname_base, product),
polarization flag columns, start/stop stamps, bbox footprint. ~10% of
scenes share an identity key (orderkey ending in 9 pairs with its
predecessor) to exercise the duplicates routing of the ingest path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .functions.names import outname_base_array

# ------------------------------------------------------------- scenes

SENSORS = ("S1A", "S1B", "PSR2", "TSX1")
MODES = ("IW", "EW", "FBD", "SM")
PRODUCTS = ("GRD", "GRD", "SLC")  # key % 3 → GRD twice as common

_EPOCH = np.datetime64("2015-01-01T00:00:00", "s")


def scene_start_stamps(ident: np.ndarray) -> np.ndarray:
    """Deterministic YYYYmmddTHHMMSS start stamp per identity key.

    start = 2015-01-01 + (ident * 524287 % 31536000) seconds  (within 2015).
    SQL twin: strftime(TIMESTAMP '2015-01-01' + to_seconds(...), '%Y%m%dT%H%M%S').
    """
    secs = ident * 524287 % 31536000
    dt = _EPOCH + secs.astype("timedelta64[s]")
    return np.datetime_as_string(dt, unit="s")


def scenes_from_orders(keys: np.ndarray) -> pa.Table:
    """Derive one catalog scene row per o_orderkey (vectorized).

    All SQL-twin formulas (see __ray_entry__.SCENES_SQL):
      ident  = key - 1 when key % 10 == 9 else key   (≈10% duplicate pairs)
      xmin   = (ident * 9973  % 33000) / 100.0 - 170.0
      ymin   = (ident * 7919  % 13000) / 100.0 - 70.0
      xmax   = xmin + (100 + ident % 7 * 50) / 100.0
      ymax   = ymin + (100 + ident % 5 * 50) / 100.0
      sensor = SENSORS[ident % 4]; mode = MODES[ident % 4]
      orbit  = 'A' if ident % 2 == 0 else 'D'
      product= PRODUCTS[ident % 3]
      vv/vh  = 1 when sensor starts with 'S1' else 0; hh/hv inverse
    """
    k = np.asarray(keys, dtype=np.int64)
    ident = np.where(k % 10 == 9, k - 1, k)
    xmin = (ident * 9973 % 33000) / 100.0 - 170.0
    ymin = (ident * 7919 % 13000) / 100.0 - 70.0
    xmax = xmin + (100 + ident % 7 * 50) / 100.0
    ymax = ymin + (100 + ident % 5 * 50) / 100.0
    sensor = np.array(SENSORS, dtype=object)[ident % 4]
    mode = np.array(MODES, dtype=object)[ident % 4]
    orbit = np.where(ident % 2 == 0, "A", "D").astype(object)
    product = np.array(PRODUCTS, dtype=object)[ident % 3]
    start = scene_start_stamps(ident)
    start_str = (
        pd.Series(start)
        .str.replace("-", "", regex=False)
        .str.replace(":", "", regex=False)
        .to_numpy(dtype=object)
    )
    # stop = start + 25 s (reference scenes are ~25 s acquisitions)
    stop = np.datetime_as_string(
        (_EPOCH + (ident * 524287 % 31536000 + 25).astype("timedelta64[s]")), unit="s"
    )
    stop_str = (
        pd.Series(stop)
        .str.replace("-", "", regex=False)
        .str.replace(":", "", regex=False)
        .to_numpy(dtype=object)
    )
    base = outname_base_array(sensor, mode, orbit, start_str)
    s1 = pd.Series(sensor).str.startswith("S1").to_numpy()
    return pa.table(
        {
            "scene_key": pa.array(k),
            "sensor": pa.array(sensor, type=pa.string()),
            "acquisition_mode": pa.array(mode, type=pa.string()),
            "orbit": pa.array(orbit, type=pa.string()),
            "start": pa.array(start_str, type=pa.string()),
            "stop": pa.array(stop_str, type=pa.string()),
            "product": pa.array(product, type=pa.string()),
            "outname_base": pa.array(base, type=pa.string()),
            "scene": pa.array([f"/data/scenes/scene-{x:09d}.zip" for x in k], type=pa.string()),
            "hh": pa.array((~s1).astype(np.int32)),
            "vv": pa.array(s1.astype(np.int32)),
            "hv": pa.array((~s1).astype(np.int32)),
            "vh": pa.array(s1.astype(np.int32)),
            "xmin": pa.array(xmin),
            "ymin": pa.array(ymin),
            "xmax": pa.array(xmax),
            "ymax": pa.array(ymax),
        }
    )


# --------------------------------------------------- real-format blobs

#: key % 3 → (format, sensor, mode, product, polarizations)
BLOB_FORMATS = (
    ("SAFE", "S1A", "IW", "GRD", ("VV", "VH")),
    ("CEOS_PSR", "PSR2", "FBD", "1.5", ("HH", "HV")),
    ("TSX", "TSX1", "SM", "MGD", ("HH",)),
)


def scene_blob_metas(keys: np.ndarray) -> list[tuple[str, dict]]:
    """(format, full-16-attribute meta) per key, for the real-grammar
    blob builders (sources.formats). Every field is reproduced by the
    IDENTIFY_SQL twin in __ray_entry__ — integer arithmetic first, IEEE
    double ops second, so the parse→derive round-trip hash-matches.

    Formulas (k = o_orderkey):
      fmt      = k % 3 → SAFE / CEOS_PSR / TSX
      orbit    = 'A' if k % 2 == 0 else 'D'
      start    = 2015-01-01 + (k * 524287 % 31536000) s; stop = +25 s
      lines    = (k * 37 % 9000 + 1000) * 2   (even: CEOS stores halves)
      samples  = (k * 53 % 9000 + 1200) * 2
      abs      = k % 99000 + 1; per-cycle 207 (PSR2) else 175
      frame    = k % 9999 + 1
      spacing  = ((k % 40) / 4.0 + 1.25, (k % 25) / 5.0 + 0.5)
      bbox     = the scenes_from_orders corner formulas (no dup folding)
    """
    from .sources.formats.common import WKT4326

    ks = np.asarray(keys, dtype=np.int64)
    starts = scene_start_stamps(ks)
    stops = np.datetime_as_string(
        (_EPOCH + (ks * 524287 % 31536000 + 25).astype("timedelta64[s]")), unit="s"
    )
    out = []
    for i, k in enumerate(ks.tolist()):
        fmt, sensor, mode, product, pols = BLOB_FORMATS[k % 3]
        xmin = (k * 9973 % 33000) / 100.0 - 170.0
        ymin = (k * 7919 % 13000) / 100.0 - 70.0
        xmax = xmin + (100 + k % 7 * 50) / 100.0
        ymax = ymin + (100 + k % 5 * 50) / 100.0
        onum = k % 99000 + 1
        per_cycle = 207 if fmt == "CEOS_PSR" else 175
        meta = {
            "sensor": sensor,
            "acquisition_mode": mode,
            "orbit": "A" if k % 2 == 0 else "D",
            "start": starts[i].replace("-", "").replace(":", ""),
            "stop": str(stops[i]).replace("-", "").replace(":", ""),
            "product": product,
            "lines": (k * 37 % 9000 + 1000) * 2,
            "samples": (k * 53 % 9000 + 1200) * 2,
            "orbitNumber_abs": onum,
            "orbitNumber_rel": onum % per_cycle,
            "cycleNumber": onum // per_cycle + 1,
            "frameNumber": k % 9999 + 1,
            "polarizations": list(pols),
            "spacing": ((k % 40) / 4.0 + 1.25, (k % 25) / 5.0 + 0.5),
            "coordinates": [(xmin, ymin), (xmax, ymin), (xmax, ymax), (xmin, ymax)],
            "projection": WKT4326,
        }
        out.append((fmt, meta))
    return out


def scene_blobs(keys: np.ndarray) -> pa.Table:
    """Encode one real-grammar blob per key: (scene_key, fmt, blob)."""
    from .sources.formats import build_ceos_psr_blob, build_safe_blob, build_tsx_blob

    builders = {"SAFE": build_safe_blob, "CEOS_PSR": build_ceos_psr_blob, "TSX": build_tsx_blob}
    metas = scene_blob_metas(keys)
    blobs = [builders[fmt](meta) for fmt, meta in metas]
    return pa.table(
        {
            "scene_key": pa.array(np.asarray(keys, dtype=np.int64)),
            "fmt": pa.array([fmt for fmt, _ in metas], type=pa.string()),
            "blob": pa.array(blobs, type=pa.binary()),
        }
    )


# ------------------------------------------------- quad footprints

#: numerators are dyadic (÷16, ÷32) so corner fractions are exact doubles
#: and the numpy / DuckDB renderings round identically.


def quad_corners_from_keys(keys: np.ndarray) -> dict[str, np.ndarray]:
    """Convex CCW quadrilateral footprint per scene key (vectorized).

    Real SAR footprints are acquisition quads, not axis-aligned boxes
    (reference identify() corner coordinates, e.g. drivers.py SAFE /
    CEOS corner parses). The synthetic quad puts one vertex on each
    edge of the scene bbox — edge direction vectors then fall in
    quadrants I→II→III→IV in order, which forces left turns at every
    vertex: the quad is convex and CCW **by construction** for any key.

    SQL twin: QUADS_SQL. All formulas are integer arithmetic followed
    by exact dyadic fractions and one fused chain of IEEE double ops
    written identically on both sides:

      w   = (100 + ident % 7 * 50) / 100.0     (= xmax - xmin exactly)
      h   = (100 + ident % 5 * 50) / 100.0
      qax = xmin + (ident % 11) / 16.0 * w ;  qay = ymin
      qbx = xmin + w                       ;  qby = ymin + (ident % 13) / 16.0 * h
      qcx = xmin + w - (ident % 17) / 32.0 * w ; qcy = ymin + h
      qdx = xmin                           ;  qdy = ymin + h - (ident % 19) / 32.0 * h
    """
    k = np.asarray(keys, dtype=np.int64)
    ident = np.where(k % 10 == 9, k - 1, k)
    xmin = (ident * 9973 % 33000) / 100.0 - 170.0
    ymin = (ident * 7919 % 13000) / 100.0 - 70.0
    w = (100 + ident % 7 * 50) / 100.0
    h = (100 + ident % 5 * 50) / 100.0
    return {
        "qax": xmin + (ident % 11) / 16.0 * w,
        "qay": ymin,
        "qbx": xmin + w,
        "qby": ymin + (ident % 13) / 16.0 * h,
        "qcx": xmin + w - (ident % 17) / 32.0 * w,
        "qcy": ymin + h,
        "qdx": xmin,
        "qdy": ymin + h - (ident % 19) / 32.0 * h,
    }


QUADS_SQL = """
    SELECT
        scene_key,
        xmin, ymin, xmin + w AS xmax, ymin + h AS ymax,
        xmin + (ident % 11) / 16.0 * w AS qax,
        ymin AS qay,
        xmin + w AS qbx,
        ymin + (ident % 13) / 16.0 * h AS qby,
        xmin + w - (ident % 17) / 32.0 * w AS qcx,
        ymin + h AS qcy,
        xmin AS qdx,
        ymin + h - (ident % 19) / 32.0 * h AS qdy
    FROM (
        SELECT
            o_orderkey AS scene_key,
            ident,
            (ident * 9973 % 33000) / 100.0 - 170.0 AS xmin,
            (ident * 7919 % 13000) / 100.0 - 70.0 AS ymin,
            (100 + ident % 7 * 50) / 100.0 AS w,
            (100 + ident % 5 * 50) / 100.0 AS h
        FROM (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 10 = 9 THEN o_orderkey - 1 ELSE o_orderkey END AS ident
            FROM orders
        )
    )
"""


# ------------------------------------------------------------- points


def points_from_lineitem(orderkey: np.ndarray, linenumber: np.ndarray) -> pa.Table:
    """Derive one geolocated point per lineitem row (vectorized).

    SQL twin:
      pk   = l_orderkey * 8 + l_linenumber
      lon  = (pk * 104729   % 36000) / 100.0 - 180.0
      lat  = (pk * 15485863 % 18000) / 100.0 - 90.0
    """
    pk = np.asarray(orderkey, dtype=np.int64) * 8 + np.asarray(linenumber, dtype=np.int64)
    lon = (pk * 104729 % 36000) / 100.0 - 180.0
    lat = (pk * 15485863 % 18000) / 100.0 - 90.0
    return pa.table({"point_id": pa.array(pk), "lon": pa.array(lon), "lat": pa.array(lat)})


# ------------------------------------------------------------- OSV files

#: all synthetic orbit files span exactly 7 days (enables the fixed-window
#: searchsorted candidate lookup in stages.asof; the reference's POE files
#: are likewise fixed-length dressings around one day, S1/auxil.py:670-692)
OSV_DURATION = 604800


def osv_from_supplier(keys: np.ndarray) -> pa.Table:
    """Derive an orbit-state-vector file inventory from s_suppkey (vectorized).

    Mirrors the reference's OSV model (S1/auxil.py:91-692): each file has a
    validity interval [start, stop], a sensor it applies to, a precision
    tier (POE preferred over RES, S1/auxil.py:545-587) and a publish date
    used as the tie-break (max wins).

    SQL twin (see __ray_entry__.OSV_SQL):
      osv_id      = s_suppkey
      sensor      = 'S1A' if s % 2 == 0 else 'S1B'
      osv_type    = 'POE' if s % 4 < 2 else 'RES'
      start_sec   = s * 100003 % 31536000          (seconds into 2015)
      stop_sec    = start_sec + 604800             (7-day validity)
      publish_sec = stop_sec + s % 5 * 3600
    """
    s = np.asarray(keys, dtype=np.int64)
    start = s * 100003 % 31536000
    return pa.table(
        {
            "osv_id": pa.array(s),
            "sensor": pa.array(np.where(s % 2 == 0, "S1A", "S1B").astype(object), type=pa.string()),
            "osv_type": pa.array(np.where(s % 4 < 2, "POE", "RES").astype(object), type=pa.string()),
            "start_sec": pa.array(start),
            "stop_sec": pa.array(start + OSV_DURATION),
            "publish_sec": pa.array(start + OSV_DURATION + s % 5 * 3600),
        }
    )


# SQL twins, kept adjacent to the numpy formulas they mirror.
# DuckDB `/` is float division; `%` on BIGINT matches numpy int64 for
# the positive operands used here.
SCENES_SQL = """
    SELECT
        o_orderkey AS scene_key,
        ['S1A','S1B','PSR2','TSX1'][(ident % 4 + 1)::INT] AS sensor,
        ['IW','EW','FBD','SM'][(ident % 4 + 1)::INT] AS acquisition_mode,
        CASE WHEN ident % 2 = 0 THEN 'A' ELSE 'D' END AS orbit,
        strftime(TIMESTAMP '2015-01-01' + to_seconds(ident * 524287 % 31536000),
                 '%Y%m%dT%H%M%S') AS start,
        strftime(TIMESTAMP '2015-01-01' + to_seconds(ident * 524287 % 31536000 + 25),
                 '%Y%m%dT%H%M%S') AS stop,
        ['GRD','GRD','SLC'][(ident % 3 + 1)::INT] AS product,
        rpad(['S1A','S1B','PSR2','TSX1'][(ident % 4 + 1)::INT], 4, '_') || '_' ||
        rpad(['IW','EW','FBD','SM'][(ident % 4 + 1)::INT], 4, '_') || '_' ||
        (CASE WHEN ident % 2 = 0 THEN 'A' ELSE 'D' END) || '_' ||
        strftime(TIMESTAMP '2015-01-01' + to_seconds(ident * 524287 % 31536000),
                 '%Y%m%dT%H%M%S') AS outname_base,
        '/data/scenes/scene-' || lpad(o_orderkey::VARCHAR, 9, '0') || '.zip' AS scene,
        CASE WHEN ['S1A','S1B','PSR2','TSX1'][(ident % 4 + 1)::INT] LIKE 'S1%' THEN 0 ELSE 1 END AS hh,
        CASE WHEN ['S1A','S1B','PSR2','TSX1'][(ident % 4 + 1)::INT] LIKE 'S1%' THEN 1 ELSE 0 END AS vv,
        CASE WHEN ['S1A','S1B','PSR2','TSX1'][(ident % 4 + 1)::INT] LIKE 'S1%' THEN 0 ELSE 1 END AS hv,
        CASE WHEN ['S1A','S1B','PSR2','TSX1'][(ident % 4 + 1)::INT] LIKE 'S1%' THEN 1 ELSE 0 END AS vh,
        (ident * 9973 % 33000) / 100.0 - 170.0 AS xmin,
        (ident * 7919 % 13000) / 100.0 - 70.0 AS ymin,
        (ident * 9973 % 33000) / 100.0 - 170.0 + (100 + ident % 7 * 50) / 100.0 AS xmax,
        (ident * 7919 % 13000) / 100.0 - 70.0 + (100 + ident % 5 * 50) / 100.0 AS ymax
    FROM (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 10 = 9 THEN o_orderkey - 1 ELSE o_orderkey END AS ident
        FROM orders
    )
"""

POINTS_SQL = """
    SELECT
        l_orderkey * 8 + l_linenumber AS point_id,
        ((l_orderkey * 8 + l_linenumber) * 104729 % 36000) / 100.0 - 180.0 AS lon,
        ((l_orderkey * 8 + l_linenumber) * 15485863 % 18000) / 100.0 - 90.0 AS lat
    FROM lineitem
"""

OSV_SQL = """
    SELECT
        s_suppkey AS osv_id,
        CASE WHEN s_suppkey % 2 = 0 THEN 'S1A' ELSE 'S1B' END AS sensor,
        CASE WHEN s_suppkey % 4 < 2 THEN 'POE' ELSE 'RES' END AS osv_type,
        s_suppkey * 100003 % 31536000 AS start_sec,
        s_suppkey * 100003 % 31536000 + 604800 AS stop_sec,
        s_suppkey * 100003 % 31536000 + 604800 + s_suppkey % 5 * 3600 AS publish_sec
    FROM supplier
"""


# ----------------------------------------------------------- partsupp

def partsupp_values(pk: np.ndarray, sk: np.ndarray) -> "tuple[np.ndarray, np.ndarray]":
    """Deterministic partsupp attributes per (partkey, suppkey) pair.

    The driver fixture has no partsupp table (which blocks TPC-H
    Q9/Q11/Q20), so the engine derives one — like scenes/points — from
    the DISTINCT (l_partkey, l_suppkey) pairs of lineitem (referential
    integrity with lineitem holds by construction, the property those
    queries' pair joins rely on), with attributes as pure integer
    functions of the pair:

        ps_availqty      = (pk*31 + sk*17) % 9999 + 1
        ps_supplycost_c  = (pk*523 + sk*1009) % 99900 + 100   -- cents

    SQL twin: PARTSUPP_SQL. Because the attributes are a pure function
    of the pair, a consumer MAY compute them at the use site instead of
    joining the materialized table (the shipped-model contract, cf.
    doc_kneser_ney); the oracle always goes through the view.
    """
    pk = pk.astype(np.int64)
    sk = sk.astype(np.int64)
    availqty = (pk * 31 + sk * 17) % 9999 + 1
    supplycost_c = (pk * 523 + sk * 1009) % 99900 + 100
    return availqty, supplycost_c


PARTSUPP_SQL = """
    SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
           (l_partkey * 31 + l_suppkey * 17) % 9999 + 1 AS ps_availqty,
           (l_partkey * 523 + l_suppkey * 1009) % 99900 + 100 AS ps_supplycost_c
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
"""


# ------------------------------------------- lineitem extension columns

#: dbgen ship modes, indexed by the derivation formula below
SHIPMODES = ("REG AIR", "AIR", "RAIL", "SHIP", "TRUCK", "MAIL", "FOB")


def lineitem_ext(
    ok: np.ndarray, ln: np.ndarray, ship_us: np.ndarray
) -> "tuple[np.ndarray, np.ndarray, np.ndarray]":
    """Derived lineitem columns the fixture omits (unblocks TPC-H
    Q12/Q21 the same way the derived partsupp unblocked Q9/Q11/Q20):

        l_shipmode    = SHIPMODES[(ok·7 + ln·13) % 7]
        l_commitdate  = l_shipdate + ((ok·31 + ln·7) % 61 − 30) days
        l_receiptdate = l_shipdate + ((ok·17 + ln·11) % 30 + 1) days

    Pure integer functions of the row key; the SQL twin evaluates the
    identical expressions (LINEITEM_EXT_SQL). ``ship_us`` is the ship
    timestamp in integer microseconds; returns (mode_idx int64,
    commit_us, receipt_us). Receipt is always strictly after ship;
    commit straddles ship by ±30 days so the late-delivery predicates
    (commit < receipt, ship < commit) select non-trivial subsets.
    """
    ok = ok.astype(np.int64)
    ln = ln.astype(np.int64)
    us_day = 86_400_000_000
    mode_idx = (ok * 7 + ln * 13) % 7
    commit_us = ship_us + ((ok * 31 + ln * 7) % 61 - 30) * us_day
    receipt_us = ship_us + ((ok * 17 + ln * 11) % 30 + 1) * us_day
    return mode_idx, commit_us, receipt_us


LINEITEM_EXT_SQL = """
    SELECT l.*,
           ['REG AIR','AIR','RAIL','SHIP','TRUCK','MAIL','FOB'][
               (l_orderkey * 7 + l_linenumber * 13) % 7 + 1
           ] AS l_shipmode,
           l_shipdate + ((l_orderkey * 31 + l_linenumber * 7) % 61 - 30)
               * INTERVAL 1 DAY AS l_commitdate,
           l_shipdate + ((l_orderkey * 17 + l_linenumber * 11) % 30 + 1)
               * INTERVAL 1 DAY AS l_receiptdate
    FROM lineitem l
"""
