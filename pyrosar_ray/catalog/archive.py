"""RayArchive — the reference Archive's query surface over ray.data.

Reproduces Archive.select semantics (pyroSAR/archive.py:902-1113):
- attribute predicates: scalar equality or IN-lists
- date predicates: strict (start>=mindate AND stop<=maxdate) vs overlap
  (stop>=mindate AND start<=maxdate); malformed date strings are IGNORED
  with a warning, never raised (archive.py:1029-1051)
- unknown kwargs are ignored with a warning (archive.py:997-1001)
- polarization flags hh/vv/hv/vh = 1 (archive.py:1053-1056)
- spatial predicate: footprint-intersects-query via the broadcast
  semi-join stage (archive.py:1058-1073)
- invalid return_value entries raise ValueError (tests/test_archive.py:55-56)
- pseudo return values: mindate → start, maxdate → stop, geometry_wkt,
  geometry_wkb

The storage model is a pair of Parquet directories (``data``,
``duplicates``) written by the ingest pipeline; select compiles to
pyarrow compute filters inside map_batches (pushed to the read where
possible) — no SQL engine.
"""

from __future__ import annotations

import logging
import re

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from ..functions.geometry import bbox_ring, polygon_wkb, polygon_wkt
from ..stages.dedup_scenes import mark_duplicates, split_registered
from ..stages.spatial import broadcast_polygon_filter

log = logging.getLogger(__name__)

_DATE_RE = re.compile("[0-9]{8}T[0-9]{6}")

#: queryable catalog columns (reference DDL archive.py:374-394 minus geometry)
COLNAMES = (
    "sensor",
    "orbit",
    "acquisition_mode",
    "start",
    "stop",
    "product",
    "outname_base",
    "scene",
    "hh",
    "vv",
    "hv",
    "vh",
    "scene_key",
    "xmin",
    "ymin",
    "xmax",
    "ymax",
)

_PSEUDO_RETURNS = ("mindate", "maxdate", "geometry_wkt", "geometry_wkb")


def apply_predicates(ds: Dataset, specs: list[tuple[str, str, object]]) -> Dataset:
    """AND-combine (col, op, value) predicates vectorized in one map_batches."""

    def _filter(batch: pa.Table) -> pa.Table:
        mask = None
        for col, op, val in specs:
            arr = batch[col]
            if op == "eq":
                m = pc.equal(arr, pa.scalar(val))
            elif op == "in":
                m = pc.is_in(arr, value_set=pa.array(val))
            elif op == "ge":
                m = pc.greater_equal(arr, pa.scalar(val))
            elif op == "le":
                m = pc.less_equal(arr, pa.scalar(val))
            else:  # pragma: no cover
                raise ValueError(op)
            mask = m if mask is None else pc.and_(mask, m)
        return batch.filter(mask)

    return ds.map_batches(_filter, batch_format="pyarrow")


class RayArchive:
    """Catalog over a scenes Dataset (+ optional duplicates Dataset).

    ``custom_fields`` registers extra queryable columns (the reference's
    Archive(custom_fields=...), archive.py:396-403) — kwargs naming them
    become predicates instead of being ignored-with-warning.
    """

    def __init__(
        self,
        data: Dataset,
        duplicates: Dataset | None = None,
        custom_fields: tuple[str, ...] = (),
    ):
        self.data = data
        self.duplicates = duplicates
        self.colnames = tuple(COLNAMES) + tuple(custom_fields)

    # ------------------------------------------------------------ ingest

    @classmethod
    def ingest(cls, scenes: Dataset, materialize: bool = False) -> "RayArchive":
        """Route an incoming scene stream into data/duplicates
        (deterministic first-wins, see stages.dedup_scenes).

        ``materialize=True`` pins the routed catalog in the object store —
        use only for catalogs that are small relative to cluster memory
        and queried repeatedly (a catalog is metadata, not imagery, so
        this is usually safe; the image table itself must never be
        materialized).
        """
        marked = mark_duplicates(scenes)
        data, dup = split_registered(marked)
        if materialize:
            data = data.materialize()
            dup = dup.materialize()
        return cls(data, dup)

    # ------------------------------------------------------------ select

    def select(
        self,
        sensor=None,
        product=None,
        acquisition_mode=None,
        mindate=None,
        maxdate=None,
        vectorobject_wkb: bytes | None = None,
        date_strict: bool = True,
        polarizations=None,
        return_value="scene",
        **kwargs,
    ) -> Dataset:
        """Filter the catalog; returns a Dataset projected to return_value.

        ``vectorobject_wkb`` replaces the reference's Vector object with a
        WKB polygon (single feature by construction).
        """
        return_values = [return_value] if isinstance(return_value, str) else list(return_value)
        invalid = [
            v for v in return_values if v not in self.colnames and v not in _PSEUDO_RETURNS
        ]
        if invalid:
            raise ValueError(
                "The following options are not supported as return values: "
                + ", ".join(invalid)
            )

        ds = self.data
        # predicate spec: (col, op, value) with op ∈ {eq, in, ge, le}
        filters: list[tuple[str, str, object]] = []

        def general(col, val):
            if isinstance(val, (list, tuple)):
                return (col, "in", list(val))
            return (col, "eq", val)

        arg_valid = {k: v for k, v in kwargs.items() if k in self.colnames}
        arg_invalid = [k for k in kwargs if k not in self.colnames]
        if arg_invalid:
            log.info(
                "the following arguments will be ignored as they are not "
                "registered in the data base: %s",
                ", ".join(arg_invalid),
            )
        for k, v in arg_valid.items():
            filters.append(general(k, v))
        if sensor is not None:
            filters.append(general("sensor", sensor))
        if product is not None:
            filters.append(general("product", product))
        if acquisition_mode is not None:
            filters.append(general("acquisition_mode", acquisition_mode))

        for name, limit, strict_col, loose_col, op in (
            ("mindate", mindate, "start", "stop", "ge"),
            ("maxdate", maxdate, "stop", "start", "le"),
        ):
            if limit is None:
                continue
            if not isinstance(limit, str) or not _DATE_RE.search(limit):
                log.info(
                    "WARNING: argument %s is ignored, must be in format YYYYmmddTHHMMSS",
                    name,
                )
                continue
            col = strict_col if date_strict else loose_col
            filters.append((col, op, limit))

        if polarizations:
            for pol in polarizations:
                if pol in ("HH", "VV", "HV", "VH"):
                    filters.append((pol.lower(), "eq", 1))

        if filters:
            ds = apply_predicates(ds, filters)

        if vectorobject_wkb is not None:
            ds = broadcast_polygon_filter(ds, vectorobject_wkb)

        return self._project(ds, return_values)

    # -------------------------------------------------------- projection

    @staticmethod
    def _project(ds: Dataset, return_values: list[str]) -> Dataset:
        needs_geom = any(v.startswith("geometry_") for v in return_values)

        def _proj(batch: pa.Table) -> pa.Table:
            cols = {}
            if needs_geom:
                xmin = batch["xmin"].to_numpy()
                ymin = batch["ymin"].to_numpy()
                xmax = batch["xmax"].to_numpy()
                ymax = batch["ymax"].to_numpy()
            for v in return_values:
                if v == "mindate":
                    cols["mindate"] = batch["start"]
                elif v == "maxdate":
                    cols["maxdate"] = batch["stop"]
                elif v == "geometry_wkt":
                    cols["geometry_wkt"] = pa.array(
                        [
                            polygon_wkt(bbox_ring(xmin[i], ymin[i], xmax[i], ymax[i]))
                            for i in range(len(batch))
                        ],
                        type=pa.string(),
                    )
                elif v == "geometry_wkb":
                    cols["geometry_wkb"] = pa.array(
                        [
                            polygon_wkb(bbox_ring(xmin[i], ymin[i], xmax[i], ymax[i]))
                            for i in range(len(batch))
                        ],
                        type=pa.binary(),
                    )
                else:
                    cols[v] = batch[v]
            return pa.table(cols)

        return ds.map_batches(_proj, batch_format="pyarrow")

    # ------------------------------------------------------------- misc

    def is_registered(self, outname_base: str, product: str) -> bool:
        n = apply_predicates(
            self.data,
            [("outname_base", "eq", outname_base), ("product", "eq", product)],
        ).count()
        if n > 0:
            return True
        if self.duplicates is not None:
            return (
                apply_predicates(
                    self.duplicates, [("outname_base", "eq", outname_base)]
                ).count()
                > 0
            )
        return False

    def size(self) -> tuple[int, int]:
        """(data rows, duplicates rows) — Archive.size (archive.py:1170-1183)."""
        ndup = self.duplicates.count() if self.duplicates is not None else 0
        return self.data.count(), ndup

    def get_unique_directories(self) -> Dataset:
        """Distinct parent directories of registered scenes
        (Archive.get_unique_directories, archive.py:795-807)."""

        def _dirs(batch: pa.Table) -> pa.Table:
            dirs = [s.rsplit("/", 1)[0] for s in batch["scene"].to_pylist()]
            uniq = sorted(set(dirs))
            return pa.table({"directory": pa.array(uniq, type=pa.string())})

        # per-batch dedup partial → tiny global distinct via a C++ hash
        # aggregate (no per-group pandas calls)
        from ray.data.aggregate import Count

        partials = self.data.select_columns(["scene"]).map_batches(
            _dirs, batch_format="pyarrow"
        )
        return (
            partials.groupby("directory")
            .aggregate(Count(alias_name="_n"))
            .drop_columns(["_n"])
        )

    def drop_element(self, outname_base: str, product: str) -> "RayArchive":
        """Remove one scene from data; promote its single duplicate if any
        (Archive.drop_element, archive.py:1202-1267).

        Driver-side compaction over catalog metadata: the affected key is
        one row, so the promotion decision is a small filtered read, not
        a shuffle.
        """
        specs = [("outname_base", "eq", outname_base), ("product", "eq", product)]
        keep = self.data.map_batches(
            lambda b: b.filter(
                pc.invert(
                    pc.and_(
                        pc.equal(b["outname_base"], outname_base),
                        pc.equal(b["product"], product),
                    )
                )
            ),
            batch_format="pyarrow",
        )
        if self.duplicates is None:
            return RayArchive(keep, None)
        dup_match = apply_predicates(
            self.duplicates, [("outname_base", "eq", outname_base)]
        ).to_pandas()
        rest_dup = self.duplicates.map_batches(
            lambda b: b.filter(pc.not_equal(b["outname_base"], outname_base)),
            batch_format="pyarrow",
        )
        if len(dup_match) == 1:
            # single duplicate is promoted: re-insert as a data row with
            # the dropped row's attributes but the duplicate's scene path
            dropped = apply_predicates(self.data, specs).to_pandas()
            if len(dropped) == 1:
                promoted = dropped.assign(scene=dup_match["scene"].iloc[0])
                import ray.data as rd

                keep = keep.union(rd.from_pandas(promoted))
            return RayArchive(keep, rest_dup)
        return RayArchive(keep, self.duplicates if len(dup_match) > 1 else rest_dup)

    def cleanup(self, exists_fn) -> "RayArchive":
        """Drop rows whose scene file vanished (Archive.cleanup,
        archive.py:490-511). ``exists_fn(path) -> bool`` is evaluated
        inside map_batches (on the cluster, near the shared FS)."""

        def _filter(batch: pa.Table) -> pa.Table:
            mask = pa.array([exists_fn(s) for s in batch["scene"].to_pylist()])
            return batch.filter(mask)

        data = self.data.map_batches(_filter, batch_format="pyarrow")
        dup = (
            self.duplicates.map_batches(_filter, batch_format="pyarrow")
            if self.duplicates is not None
            else None
        )
        return RayArchive(data, dup)

    @classmethod
    def from_csv(cls, path: str) -> "RayArchive":
        """Re-ingest a legacy CSV catalog dump (Archive.import_outdated,
        archive.py:809-837): read → dedup-route into data/duplicates."""
        import ray.data as rd

        return cls.ingest(rd.read_csv(path))

    def move(
        self, scenelist: list[str], directory: str
    ) -> tuple["RayArchive", list[str]]:
        """Rewrite the catalog paths of moved scenes (Archive.move,
        archive.py:839-894).

        The reference moves the files AND updates the data/duplicates
        rows; the engine owns only the catalog side — the caller does
        the I/O. Returns ``(updated archive, double)`` where ``double``
        lists scenes whose target basename collides with another moved
        scene (the reference skips those, leaving them in place).
        Path rewriting is a vectorized per-batch replacement against a
        broadcast map — both tables stream, no shuffle.
        """
        import os

        targets: dict[str, str] = {}
        double: list[str] = []
        seen: set[str] = set()
        for scene in scenelist:
            new = os.path.join(directory, os.path.basename(scene))
            if new in seen:
                double.append(scene)
                continue
            seen.add(new)
            targets[scene] = new

        def _rewrite(batch: pa.Table) -> pa.Table:
            import pandas as pd

            scenes = batch["scene"].to_pandas()
            mapped = scenes.map(targets).fillna(scenes)
            idx = batch.schema.get_field_index("scene")
            return batch.set_column(idx, "scene", pa.array(mapped, type=pa.string()))

        data = self.data.map_batches(_rewrite, batch_format="pyarrow")
        dups = (
            self.duplicates.map_batches(_rewrite, batch_format="pyarrow")
            if self.duplicates is not None
            else None
        )
        out = RayArchive(data, dups)
        out.colnames = self.colnames
        return out, double

    #: hard cap on shapefile export rows — the .shp format itself tops out
    #: at 2^31 bytes (~4.7M bbox polygon records), and the writer patches
    #: global header fields (bbox, record count), so the export is a
    #: bounded driver-side assembly by format contract, never a big-data
    #: sink.  Past the cap the export fails loudly instead of OOMing.
    SHP_EXPORT_MAX_ROWS = 1_000_000

    def export(self, path: str, fmt: str = "parquet") -> None:
        """Dump the catalog (Archive.export2shp analogue; archive.py:668-715).

        ``fmt='shp'`` writes a real ESRI Shapefile (pure-Python writer,
        :mod:`.shapefile` — same name-laundering as the reference's
        VectorTranslate path); parquet/csv are the Ray-native formats.
        The shapefile path streams batches off the Dataset and enforces
        :attr:`SHP_EXPORT_MAX_ROWS` BEFORE accumulating past the bound —
        driver memory is capped at the format's own single-file ceiling;
        bigger catalogs must export to parquet/csv (distributed sinks)."""
        if fmt == "parquet":
            self.data.write_parquet(path)
        elif fmt == "csv":
            self.data.write_csv(path)
        elif fmt == "shp":
            import pandas as pd

            from .shapefile import write_shapefile

            parts: list[pd.DataFrame] = []
            n = 0
            for b in self.data.iter_batches(
                batch_format="pandas", batch_size=65536
            ):
                n += len(b)
                if n > self.SHP_EXPORT_MAX_ROWS:
                    raise ValueError(
                        f"shapefile export exceeds the "
                        f"{self.SHP_EXPORT_MAX_ROWS}-row single-file bound "
                        f"(ESRI .shp is a 2^31-byte format); export to "
                        f"'parquet' or 'csv' for catalogs this large"
                    )
                parts.append(b)
            if parts:
                df = pd.concat(parts, ignore_index=True)
            else:
                df = pd.DataFrame(
                    {f.name: pd.Series(dtype=f.type.to_pandas_dtype())
                     for f in self.data.schema().base_schema}
                )
            write_shapefile(df, path)
        else:
            raise ValueError(f"unsupported export format: {fmt}")
