"""GAMMA-style intermediate-product namespace with chain-level resume.

The reference manages the dozens of intermediates in its GAMMA geocode
chain through ``Namespace`` (gamma/auxil.py:266-357): products are
registered by key, named ``{outdir}/{basename}_{key}``, unregistered
keys read as ``'-'`` (GAMMA's "no file" argument), and chain steps skip
work when their outputs already exist (``exist_ok`` in
``gamma.util.multilook``; the ``all_exist`` guard before ``MLI_cat``,
gamma/util.py:900-916) — which is what makes a killed run resumable
from its surviving intermediates.

:class:`Namespace` is the API twin (appreciate/depreciate/getall/
select/isappreciated/isfile, ``.`` → ``_`` key laundering, ``'-'``
fallback). :meth:`Namespace.ensure` adds the engine's resume contract
on top: each produced intermediate gets a ``.lineage.json`` sidecar
written AFTER the producer succeeds (tmp + rename, so a crash
mid-product never leaves a file that looks finished), and a re-run with
``exist_ok=True`` reuses any intermediate whose sidecar survives —
the same semantics ``state.lineage`` gives partitioned Dataset sinks,
applied to the gamma chain's file-shaped intermediates.
"""

from __future__ import annotations

import json
import os
import time

_SIDECAR = ".lineage.json"


class Namespace:
    """GAMMA file-name handler (reference gamma/auxil.py:266-357)."""

    def __init__(self, directory: str, basename: str):
        self.__base = basename
        self.__outdir = directory
        self.__reg: list[str] = []

    def __getitem__(self, item):
        return self.get(str(item).replace(".", "_"))

    def __getattr__(self, item):
        # only runs when the attribute is not set: unregistered → '-'
        return "-"

    def appreciate(self, keys: list[str]) -> None:
        """Register keys as wanted products (named paths)."""
        for key in keys:
            launder = key.replace(".", "_")
            setattr(
                self,
                launder,
                os.path.join(self.__outdir, self.__base + "_" + key),
            )
            if launder not in self.__reg:
                self.__reg.append(launder)

    def depreciate(self, keys: list[str]) -> None:
        """Register keys as unwanted (``'-'`` placeholder arguments)."""
        for key in keys:
            launder = key.replace(".", "_")
            setattr(self, launder, "-")
            if launder not in self.__reg:
                self.__reg.append(launder)

    def getall(self) -> dict:
        return {key: getattr(self, key) for key in self.__reg}

    def select(self, selection: list[str]) -> list[str]:
        return [getattr(self, key) for key in selection]

    def isregistered(self, key: str) -> bool:
        return key in self.__reg

    def isappreciated(self, key: str) -> bool:
        return self.isregistered(key) and self.get(key) != "-"

    def isfile(self, key: str) -> bool:
        return hasattr(self, key) and os.path.isfile(getattr(self, key))

    def get(self, key: str):
        return getattr(self, key)

    # ------------------------------------------------- chain resume

    def iscomplete(self, key: str) -> bool:
        """Product file AND lineage sidecar exist — the product finished.

        A file without its sidecar is a crash-torn intermediate and does
        NOT count (the reference's bare ``os.path.isfile`` guard would
        wrongly trust it)."""
        if not self.isappreciated(key):
            return False
        path = self.get(key)
        return os.path.isfile(path) and os.path.isfile(path + _SIDECAR)

    def ensure(self, key: str, producer, exist_ok: bool = True) -> str:
        """Produce the intermediate ``key`` unless it already completed.

        ``producer(path)`` must create the file at ``path``; the sidecar
        is written only after it returns, via tmp + atomic rename. With
        ``exist_ok=True`` (the reference's flag) a completed product is
        reused without calling the producer — the chain-resume
        semantics of gamma/util.py:935-945. ``exist_ok=False`` always
        reproduces. Returns the product path.
        """
        if not self.isappreciated(key):
            raise KeyError(f"product {key!r} is not appreciated in this namespace")
        path = self.get(key)
        if exist_ok and self.iscomplete(key):
            return path
        producer(path)
        if not os.path.isfile(path):
            raise RuntimeError(f"producer for {key!r} did not create {path}")
        meta = {
            "key": key,
            "bytes": os.path.getsize(path),
            "mtime": os.path.getmtime(path),
            "written_at": time.time(),
        }
        tmp = path + _SIDECAR + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(meta, fh)
        os.replace(tmp, path + _SIDECAR)
        return path

    def completed(self) -> list[str]:
        """Keys of all finished intermediates (the resume manifest)."""
        return [k for k in self.__reg if self.iscomplete(k)]
