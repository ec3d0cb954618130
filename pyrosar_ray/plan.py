"""Processing-plan model: operator DAGs, worker grouping, plan splitting.

Engine twin of the reference's SNAP workflow machinery, re-expressed as
a plain in-memory DAG (no XML, no files): a :class:`Plan` is an ordered
list of :class:`Node` (operator + parameters + source links); the
reference semantics reproduced here are

- ``suffix`` — ordered unique operator abbreviations joined by ``_``
  (snap/auxil.py:1114-1139; abbreviation table from the reference's
  snap.suffix config keys)
- ``group_by_workers`` — chunk the worker chain into groups of ≤ n
  (Read/Write/BandSelect excluded from counting) with the forced
  co-location rule moving ThermalNoiseRemoval/Warp heads into their
  source's group, then re-attaching Read/Write/BandSelect nodes
  (snap/auxil.py:699-767; golden: the geocode chain at n=2 → 4 groups,
  n=100 → 1 group, tests/test_snap.py:34-45)
- ``split`` — materialize each group as a standalone sub-plan with
  Read/Write nodes linking intermediate products
  (snap/auxil.py:586-696)

Ray-side meaning: groups are stage-fusion boundaries — the engine runs
each group as one actor-pool ``map_batches`` stage whose intermediates
live in worker memory (see stages.images.ImageProcessChain); ``split``
output maps 1:1 onto such stages with object-store hand-off between
them.
"""

from __future__ import annotations

from dataclasses import dataclass, field

#: operator → filename-suffix abbreviation (reference: the snap.suffix
#: section of pyroSAR's config; empty string = contributes no suffix)
SUFFIX_LOOKUP = {
    "Read": "",
    "Write": "",
    "BandSelect": "",
    "Apply-Orbit-File": "Orb",
    "Calibration": "Cal",
    "Remove-GRD-Border-Noise": "bnr",
    "ThermalNoiseRemoval": "NR",
    "TOPSAR-Deburst": "Deb",
    "SliceAssembly": "SA",
    "Multilook": "ML",
    "Terrain-Flattening": "TF",
    "Speckle-Filter": "SF",
    "Terrain-Correction": "TC",
    "LinearToFromdB": "dB",
    "Subset": "Sub",
    "BandMerge": "BM",
    "BandMaths": "BMa",
}

#: operators that must execute in the same group as their source
CO_LOCATE = ("ThermalNoiseRemoval", "Warp")

_PASSTHROUGH = ("Read", "Write", "BandSelect")


def value2str(value) -> str | None:
    """Coerce a plan parameter value to its workflow string form.

    Reference semantics (snap/auxil.py:1433-1455): booleans lowercase,
    lists comma-join their ``str`` items, ``None`` passes through, and
    everything else is ``str()``-ed. ``bool`` is checked before ``int``
    since Python bools are ints.
    """
    if isinstance(value, bool):
        return str(value).lower()
    if isinstance(value, (list, tuple)):
        return ",".join(map(str, value))
    if value is None:
        return None
    return str(value)


@dataclass
class Node:
    id: str
    operator: str
    parameters: dict = field(default_factory=dict)
    sources: list[str] = field(default_factory=list)

    def parameters_str(self) -> dict:
        """Parameters coerced to their serialized string forms
        (:func:`value2str` per value) — what the reference writes into
        workflow XML nodes."""
        return {k: value2str(v) for k, v in self.parameters.items()}


class Plan:
    """Ordered operator DAG (insertion order = execution order)."""

    def __init__(self, nodes: list[Node] | None = None):
        self.nodes: list[Node] = list(nodes or [])

    def __getitem__(self, node_id: str) -> Node:
        for n in self.nodes:
            if n.id == node_id:
                return n
        raise KeyError(node_id)

    def __iter__(self):
        return iter(self.nodes)

    def ids(self) -> list[str]:
        return [n.id for n in self.nodes]

    def add(self, node: Node) -> "Plan":
        self.nodes.append(node)
        return self

    def is_consistent(self) -> bool:
        """Every source link resolves to an earlier node."""
        seen: set[str] = set()
        for n in self.nodes:
            if any(s not in seen for s in n.sources):
                return False
            seen.add(n.id)
        return True

    def suffix(self, stop: str | None = None) -> str:
        """Ordered unique operator abbreviations, underscore-joined."""
        seen: list[str] = []
        for n in self.nodes:
            if n.operator not in seen:
                seen.append(n.operator)
            if n.id == stop:
                break
        return "_".join(filter(None, (SUFFIX_LOOKUP.get(op, op[:3]) for op in seen)))


def group_by_workers(plan: Plan, n: int = 2) -> list[list[str]]:
    """Chunk the worker chain into groups of ≤ n workers, reproducing the
    reference's co-location and Read/Write/BandSelect attachment rules."""
    workers = [x.id for x in plan if x.operator not in _PASSTHROUGH]
    readers = [x.id for x in plan if x.operator == "Read"]
    writers = [x.id for x in plan if x.operator == "Write"]
    selects = [x.id for x in plan if x.operator == "BandSelect"]
    groups = [workers[i : i + n] for i in range(0, len(workers), n)]

    def move_group(operator: str) -> None:
        i = 0
        while i < len(groups):
            if groups[i][0].startswith(operator):
                source = plan[groups[i][0]].sources[0]
                source_group = [source in g for g in groups].index(True)
                groups[source_group].append(groups[i][0])
                del groups[i][0]
            if len(groups[i]) == 0:
                del groups[i]
            else:
                i += 1

    for operator in CO_LOCATE:
        move_group(operator)

    for item in selects:
        source = plan[item].sources[0]
        for group in groups:
            if source in group:
                group.insert(group.index(source) + 1, item)

    out = []
    for group in groups:
        newgroup: list[str] = []
        for worker in group:
            newgroup.append(worker)
            for src in plan[worker].sources:
                if src in readers:
                    newgroup.insert(newgroup.index(worker), src)
            for writer in writers:
                if plan[writer].sources == [worker]:
                    newgroup.append(writer)
        out.append(newgroup)
    return out


def split(plan: Plan, groups: list[list[str]]) -> list[Plan]:
    """Materialize each group as a standalone sub-plan.

    Cross-group source links become Read nodes of the predecessor
    group's intermediate product (named by the suffix sequence up to the
    source node); each sub-plan without a Write gets one appended —
    mirroring the reference's temp BEAM-DIMAP hand-off, with the
    object store taking the role of the tmp directory.
    """
    prod_tmp: dict[str, str] = {}
    out: list[Plan] = []
    for group in groups:
        sub = Plan()
        member = set(group)
        for node_id in group:
            node = plan[node_id]
            new_sources = []
            for src in node.sources:
                if src in member:
                    new_sources.append(src)
                else:
                    product = prod_tmp.get(src)
                    if product is None:
                        # branched DAGs: the cross-group source was not its
                        # group's last worker, so no Write was auto-appended
                        # for it — inject one into the owning sub-plan so the
                        # Read below has a producer.
                        product = plan.suffix(stop=src)
                        prod_tmp[src] = product
                        for prev in out:
                            if src in prev.ids():
                                wid = f"Write ({src})"
                                if wid not in prev.ids():
                                    prev.add(Node(wid, "Write", {"file": product}, [src]))
                                break
                    read_id = f"Read ({src})"
                    if read_id not in sub.ids():
                        sub.add(Node(read_id, "Read", {"file": product}, []))
                    new_sources.append(read_id)
            sub.add(Node(node.id, node.operator, dict(node.parameters), new_sources))
        has_write = any(x.operator == "Write" for x in sub)
        if not has_write:
            last_worker = [x for x in sub if x.operator not in _PASSTHROUGH][-1]
            product = plan.suffix(stop=last_worker.id)
            prod_tmp[last_worker.id] = product
            sub.add(Node(f"Write ({last_worker.id})", "Write", {"file": product}, [last_worker.id]))
        out.append(sub)
    return out


def geocode_plan(spacing: float = 20.0, t_srs: str = "EPSG:4326") -> Plan:
    """The reference's standard GRD geocode chain (snap/util.py:28-703)."""
    p = Plan()
    p.add(Node("Read", "Read", {}, []))
    p.add(Node("Remove-GRD-Border-Noise", "Remove-GRD-Border-Noise", {}, ["Read"]))
    p.add(Node("Calibration", "Calibration", {}, ["Remove-GRD-Border-Noise"]))
    p.add(Node("ThermalNoiseRemoval", "ThermalNoiseRemoval", {}, ["Calibration"]))
    p.add(Node("Apply-Orbit-File", "Apply-Orbit-File", {}, ["ThermalNoiseRemoval"]))
    p.add(Node("Multilook", "Multilook", {"spacing": spacing}, ["Apply-Orbit-File"]))
    p.add(
        Node("Terrain-Flattening", "Terrain-Flattening", {}, ["Multilook"])
    )
    p.add(
        Node(
            "Terrain-Correction",
            "Terrain-Correction",
            {"crs": t_srs},
            ["Terrain-Flattening"],
        )
    )
    p.add(Node("LinearToFromdB", "LinearToFromdB", {}, ["Terrain-Correction"]))
    p.add(Node("Write", "Write", {"file": "out"}, ["LinearToFromdB"]))
    return p
