"""On-disk scene ingestion: the path → blob adapter.

The reference's ``identify(scene)`` takes a FILENAME and each driver
opens the zip/tar/directory layout itself (drivers.py:69-120; SAFE zips
via ``getFileObj``, drivers.py:2528-2575; directory scenes read members
straight from disk). The engine's drivers parse a BLOB column instead —
the right unit for a distributed pipeline — so this module is the glue a
production user needs to point the engine at real archives:

- :func:`path_to_blob` — one scene path → the bytes the blob drivers
  expect. Plain files (``.zip``, ``.tar``, CEOS leaders, …) read as-is;
  an unpacked ``.SAFE``/scene DIRECTORY is packed into an in-memory
  STORED zip whose member names are prefixed with the directory's own
  name — exactly the layout of the original ESA zip, so the same
  sniffers fire on packed and unpacked scenes alike.
- :func:`identify_path` — reference-spelled ``identify(filename)``.
- :func:`find_scene_paths` — directory walk for scene-looking entries
  (the reference scans with ``spatialist.finder`` before
  ``Archive.insert``); ``.SAFE`` directories are leaves, never
  descended into.
- :func:`read_scene_paths` — the Ray-native reader: a Dataset of paths
  whose blobs are loaded INSIDE ``map_batches`` tasks (parallel I/O;
  scene bytes never gather on the driver), ready for
  ``drivers.identify_many``.
"""

from __future__ import annotations

import io
import os
import re
import zipfile

import pyarrow as pa
from ray.data import Dataset

#: entries that look like scene archives (reference Archive.insert scans
#: for the same suffixes; ``.SAFE`` covers unpacked Sentinel-1 scenes)
SCENE_PATTERN = r"(?i)\.(zip|tar(\.gz)?|safe)$"


def pack_dir_as_zip(path: str) -> bytes:
    """Pack a scene directory into an in-memory STORED zip.

    Member names are ``<dirname>/<relative path>`` with ``/`` separators
    and sorted walk order — the layout of the original distribution zip,
    so archive sniffers (manifest.safe lookups etc.) behave identically
    on packed and unpacked scenes. STORED (no deflate) keeps packing
    cheap; scene members are already compressed imagery."""
    root = os.path.abspath(path)
    base = os.path.basename(root.rstrip("/"))
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", compression=zipfile.ZIP_STORED) as zf:
        for dirpath, dirnames, filenames in os.walk(root):
            dirnames.sort()
            rel = os.path.relpath(dirpath, root)
            for fname in sorted(filenames):
                arcname = (
                    f"{base}/{fname}"
                    if rel == "."
                    else f"{base}/{rel.replace(os.sep, '/')}/{fname}"
                )
                with open(os.path.join(dirpath, fname), "rb") as fh:
                    zf.writestr(zipfile.ZipInfo(arcname), fh.read())
    return buf.getvalue()


def path_to_blob(path: str | os.PathLike) -> bytes:
    """One scene path → driver-ready bytes (directories are zip-packed)."""
    path = os.fspath(path)
    if os.path.isdir(path):
        return pack_dir_as_zip(path)
    with open(path, "rb") as fh:
        return fh.read()


def identify_path(path: str | os.PathLike) -> dict | None:
    """Reference-spelled ``identify(filename)`` (drivers.py:69-120):
    read/pack the scene at ``path`` and dispatch the blob registry."""
    from .drivers import identify

    return identify(path_to_blob(path))


def find_scene_paths(
    root: str,
    pattern: str = SCENE_PATTERN,
    recursive: bool = True,
) -> list[str]:
    """Scene-looking entries under ``root``, sorted for determinism.

    Matches files AND directories against ``pattern`` (regex on the
    entry name); matching directories (e.g. ``*.SAFE``) are returned as
    scene roots and never descended into."""
    rx = re.compile(pattern)
    out: list[str] = []
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames.sort()
        keep_dirs = []
        for d in dirnames:
            if rx.search(d):
                out.append(os.path.join(dirpath, d))
            else:
                keep_dirs.append(d)
        dirnames[:] = keep_dirs if recursive else []
        out.extend(
            os.path.join(dirpath, f) for f in sorted(filenames) if rx.search(f)
        )
    return sorted(out)


def read_scene_paths(paths: list[str] | str, blob_col: str = "blob") -> Dataset:
    """Paths → a (scene, blob) Dataset, blobs loaded inside tasks.

    ``paths`` may be a directory (scanned via :func:`find_scene_paths`)
    or an explicit list. Only the path strings ship from the driver;
    each task reads its own scenes, so ingest parallelism and memory
    scale with the path count, not the archive bytes."""
    import ray.data

    if isinstance(paths, str):
        paths = find_scene_paths(paths)
    ds = ray.data.from_items([{"scene": p} for p in paths])

    def _load(batch: pa.Table) -> pa.Table:
        scene_paths = batch["scene"].to_pylist()
        return pa.table(
            {
                "scene": pa.array(scene_paths, type=pa.string()),
                blob_col: pa.array(
                    [path_to_blob(p) for p in scene_paths], type=pa.binary()
                ),
            }
        )

    return ds.map_batches(_load, batch_format="pyarrow")
