"""SceneCatalog protocol — alternative catalog backends.

Engine twin of the reference's ``SceneArchive`` Protocol
(pyroSAR/archive.py:57-132): any backend exposing ``select`` and the
context-manager pair can stand in for :class:`RayArchive` — e.g. a
STAC-API-backed catalog that materializes query hits into a Dataset.
:class:`StaticCatalog` is the minimal conforming example used by tests.
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable

from ray.data import Dataset


@runtime_checkable
class SceneCatalog(Protocol):
    def select(self, **kwargs) -> Dataset:  # pragma: no cover - protocol
        ...

    def __enter__(self):  # pragma: no cover - protocol
        ...

    def __exit__(self, exc_type, exc_value, traceback):  # pragma: no cover
        ...


class StaticCatalog:
    """Minimal conforming backend over a fixed Dataset."""

    def __init__(self, data: Dataset):
        self.data = data

    def select(self, **kwargs) -> Dataset:
        from .archive import RayArchive

        return RayArchive(self.data).select(**kwargs)

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc_value, traceback):
        return False
