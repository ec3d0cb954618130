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

from .state.config import SNAP_SUFFICES

#: operator → filename-suffix abbreviation: the authoritative
#: snap.suffices table (state/config.py twin of the reference's
#: ``snap/data/snap.suffices.properties``) plus engine extensions for
#: the ops the engine runs outside SNAP workflows (the reference
#: handles GRD border-noise removal in Python and names its temp dir
#: 'bnr', snap/auxil.py:380; Subset/BandMerge/BandMaths keep short
#: tags so split() product names stay distinct). Operators in neither
#: table contribute no suffix, like the reference's
#: ``filter(None, get_suffix(...))`` (snap/auxil.py:1137).
SUFFIX_LOOKUP = {
    **SNAP_SUFFICES,
    "Read": "",
    "Write": "",
    "BandSelect": "",
    "Remove-GRD-Border-Noise": "bnr",
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
        return "_".join(filter(None, (SUFFIX_LOOKUP.get(op) for op in seen)))


def group_by_workers(plan: Plan, n: int = 2) -> list[list[str]]:
    """Partition the worker chain into execution groups of ≤ n workers
    with the reference's semantics (groupbyWorkers, snap/auxil.py:699):
    co-located operators never START a group, and each group carries the
    Read/Write/BandSelect nodes it touches.

    The algorithm here is boundary advancement over the chain (not the
    reference's list surgery): chunk boundaries start at multiples of
    ``n``; for each co-locate class, in declared order, every boundary
    slides forward past the run of that class sitting on it (sliding a
    boundary = moving those workers into the preceding group — in a
    chain their source IS the chain predecessor, asserted below).
    Boundaries that reach the end or collide simply vanish (empty
    groups drop). BandSelect nodes then splice in after their source,
    readers before their consumer, writers after theirs.
    """
    workers = [x.id for x in plan if x.operator not in _PASSTHROUGH]
    if not workers:
        return []
    readers = {x.id for x in plan if x.operator == "Read"}
    writers = [x.id for x in plan if x.operator == "Write"]
    selects = [x.id for x in plan if x.operator == "BandSelect"]
    chain_pos = {wid: i for i, wid in enumerate(workers)}

    bounds = list(range(n, len(workers), n))
    for op_class in CO_LOCATE:
        moved = []
        for b in bounds:
            while b < len(workers) and workers[b].startswith(op_class):
                src = plan[workers[b]].sources[0]
                if chain_pos.get(src) != b - 1:
                    raise NotImplementedError(
                        f"co-located {workers[b]!r} does not follow its "
                        "source in the worker chain; branched co-location "
                        "needs the general grouping"
                    )
                b += 1
            if b < len(workers):
                moved.append(b)
        bounds = sorted(set(moved))

    cuts = [0, *bounds, len(workers)]
    groups = [list(workers[a:b]) for a, b in zip(cuts, cuts[1:])]

    for sel in selects:
        src = plan[sel].sources[0]
        for group in groups:
            if src in group:
                group.insert(group.index(src) + 1, sel)

    out: list[list[str]] = []
    for group in groups:
        assembled: list[str] = []
        for wid in group:
            for src in plan[wid].sources:
                if src in readers:
                    assembled.append(src)
            assembled.append(wid)
            assembled.extend(w for w in writers if plan[w].sources == [wid])
        out.append(assembled)
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


# --------------------------------------------------- validated geocode build

#: Terrain-Correction ancillary layers (snap/util.py:430-434)
TC_EXPORT_OPTIONS = (
    "incidenceAngleFromEllipsoid",
    "localIncidenceAngle",
    "projectedLocalIncidenceAngle",
    "DEM",
    "layoverShadowMask",
)
#: additional export_extra ids handled outside Terrain-Correction
EXTRA_EXPORT_OPTIONS = ("scatteringArea", "gammaSigmaRatio")

#: Speckle-Filter options (snap/util.py:505-512)
SPECKLE_FILTER_OPTIONS = (
    "Boxcar",
    "Median",
    "Frost",
    "Gamma Map",
    "Refined Lee",
    "Lee",
    "Lee Sigma",
)

GEOCODING_TYPES = ("Range-Doppler", "SAR simulation cross correlation")


def _parse_t_srs(t_srs) -> str:
    """int EPSG or 'EPSG:n' string → 'EPSG:n'; anything else raises
    (the reference delegates to spatialist.crsConvert and surfaces a
    RuntimeError on unknown input, tests/test_snap.py:79-83)."""
    if isinstance(t_srs, int):
        return f"EPSG:{t_srs}"
    if isinstance(t_srs, str):
        match = __import__("re").fullmatch(r"(?:EPSG:)?(\d+)", t_srs.strip())
        if match:
            return f"EPSG:{match.group(1)}"
    raise RuntimeError(f"cannot parse t_srs: {t_srs!r}")


def build_geocode(
    record: dict,
    spacing: float = 20.0,
    t_srs=4326,
    polarizations="all",
    scaling: str = "dB",
    geocoding_type: str = "Range-Doppler",
    shapefile: dict | None = None,
    export_extra: list | None = None,
    external_dem: str | None = None,
    terrain_flattening: bool = True,
    refarea="gamma0",
    speckle_filter: str | bool = False,
    remove_border_noise: bool = True,
    nscenes: int = 1,
) -> Plan:
    """Build the geocode plan with the reference's full parameter
    validation matrix (snap/util.py:28-703; matrix anchored by
    tests/test_snap.py:48-136).

    ``record`` is a scene-contract dict (sensor, product,
    acquisition_mode, polarizations, and bbox corners xmin/xmax/
    ymin/ymax when ``shapefile`` is given). Raises exactly where the
    reference does: RuntimeError for bad polarizations / geocoding_type
    / t_srs / scaling / non-overlapping shapefile / unknown
    export_extra / missing external DEM / unsupported sensor;
    ValueError for bad speckleFilter / refarea; TypeError for a bad
    record type.
    """
    if not isinstance(record, dict):
        raise TypeError("'record' must be a scene-contract dict")
    sensor = record.get("sensor", "")
    import re as _re

    if sensor in ("ASAR", "ERS1", "ERS2"):
        pass
    elif _re.search("S1[A-Z]", sensor):
        pass
    else:
        raise RuntimeError("sensor not supported (yet)")

    # polarizations (snap/util.py:283-295)
    have = list(record.get("polarizations", []))
    if isinstance(polarizations, str):
        if polarizations == "all":
            pols = have
        elif polarizations in have:
            pols = [polarizations]
        else:
            raise RuntimeError(
                f"polarization {polarizations} does not exists in the source product"
            )
    elif isinstance(polarizations, list):
        pols = [x for x in have if x in polarizations]
    else:
        raise RuntimeError("polarizations must be of type str or list")

    if geocoding_type not in GEOCODING_TYPES:
        raise RuntimeError(f"geocoding_type not recognized: {geocoding_type}")
    crs = _parse_t_srs(t_srs)
    if scaling not in ("dB", "db", "linear"):
        raise RuntimeError('scaling must be  a string of either "dB", "db" or "linear"')

    refs = [refarea] if isinstance(refarea, str) else list(refarea)
    for item in refs:
        if item not in ("sigma0", "gamma0"):
            raise ValueError(f"unsupported value for refarea: {item}")

    if speckle_filter and speckle_filter not in SPECKLE_FILTER_OPTIONS:
        raise ValueError(
            "unsupported value for speckleFilter; options:\n- "
            + "\n- ".join(SPECKLE_FILTER_OPTIONS)
        )

    if export_extra is not None:
        for item in export_extra:
            if item not in TC_EXPORT_OPTIONS + EXTRA_EXPORT_OPTIONS:
                raise RuntimeError(f"ID '{item}' not valid for argument 'export_extra'")
        if "scatteringArea" in export_extra and not terrain_flattening:
            raise RuntimeError(
                "scatteringArea can only be created if terrain flattening is performed"
            )
        if "gammaSigmaRatio" in export_extra:
            if not terrain_flattening:
                raise RuntimeError(
                    "gammaSigmaRatio can only be created if terrain flattening is performed"
                )
            if sorted(refs) != ["gamma0", "sigma0"]:
                raise ValueError(
                    "For export_extra layer 'gammaSigmaRatio' 'refarea' "
                    "must contain both sigma0 and gamma0"
                )

    if external_dem is not None:
        import os

        if not os.path.isfile(external_dem):
            raise RuntimeError("specified external DEM file does not exist")

    # shapefile subset guard (+0.01° buffer, snap/auxil.py:1760-1768)
    if shapefile is not None:
        buffered = {
            "xmin": shapefile["xmin"] - 0.01,
            "xmax": shapefile["xmax"] + 0.01,
            "ymin": shapefile["ymin"] - 0.01,
            "ymax": shapefile["ymax"] + 0.01,
        }
        overlaps = (
            buffered["xmin"] < record["xmax"]
            and buffered["xmax"] > record["xmin"]
            and buffered["ymin"] < record["ymax"]
            and buffered["ymax"] > record["ymin"]
        )
        if not overlaps:
            raise RuntimeError("no bounding box intersection between shapefile and scene")

    # ---- assemble the node chain (conditional, snap/util.py:325-549)
    p = Plan()
    p.add(Node("Read", "Read", {}, []))
    last = "Read"
    is_s1 = bool(_re.search("S1[A-Z]", sensor))
    if is_s1 and record.get("product") == "GRD" and remove_border_noise:
        p.add(Node("Remove-GRD-Border-Noise", "Remove-GRD-Border-Noise",
                   {"selectedPolarisations": pols}, [last]))
        last = "Remove-GRD-Border-Noise"
    p.add(Node("Calibration", "Calibration", {"selectedPolarisations": pols}, [last]))
    last = "Calibration"
    if is_s1:
        p.add(Node("ThermalNoiseRemoval", "ThermalNoiseRemoval", {}, [last]))
        last = "ThermalNoiseRemoval"
    if nscenes > 1:
        # multi-slice input: assemble adjacent slices into one product
        # after the per-slice radiometric chain, exactly where the
        # reference inserts it (snap/util.py:392-396). The engine
        # executes it as a groupby stage (pipelines/geocode.py); here it
        # is one single-source node since the engine's plan is the
        # per-row logical chain.
        p.add(Node("SliceAssembly", "SliceAssembly",
                   {"selectedPolarisations": pols}, [last]))
        last = "SliceAssembly"
    if is_s1 and record.get("product") == "SLC":
        mode = record.get("acquisition_mode", "")
        if mode in ("IW", "EW"):
            p.add(Node("TOPSAR-Deburst", "TOPSAR-Deburst", {}, [last]))
            last = "TOPSAR-Deburst"
        elif not _re.fullmatch("S[1-6]", mode):
            raise RuntimeError(f"acquisition mode {mode} not supported")
    p.add(Node("Apply-Orbit-File", "Apply-Orbit-File", {}, [last]))
    last = "Apply-Orbit-File"
    if shapefile is not None:
        p.add(Node("Subset", "Subset", {"extent": dict(shapefile)}, [last]))
        last = "Subset"
    p.add(Node("Multilook", "Multilook", {"spacing": spacing}, [last]))
    last = "Multilook"
    if terrain_flattening:
        p.add(Node("Terrain-Flattening", "Terrain-Flattening",
                   {"outputSigma0": "sigma0" in refs}, [last]))
        last = "Terrain-Flattening"
    if speckle_filter:
        p.add(Node("Speckle-Filter", "Speckle-Filter", {"filter": speckle_filter}, [last]))
        last = "Speckle-Filter"
    tc_extra = [x for x in (export_extra or []) if x in TC_EXPORT_OPTIONS] or None
    tc_params = {"crs": crs, "method": geocoding_type}
    if tc_extra:
        tc_params["auxiliary"] = tc_extra
    if external_dem is not None:
        tc_params["externalDEMFile"] = external_dem
    p.add(Node("Terrain-Correction", "Terrain-Correction", tc_params, [last]))
    last = "Terrain-Correction"
    if scaling in ("dB", "db"):
        p.add(Node("LinearToFromdB", "LinearToFromdB", {}, [last]))
        last = "LinearToFromdB"
    p.add(Node("Write", "Write", {"file": "out"}, [last]))
    return p


def build_noise_power(
    record: dict,
    spacing: float = 20.0,
    t_srs=4326,
    polarizations: list | None = None,
    refarea: str = "sigma0",
    rlks: int | None = None,
    azlks: int | None = None,
    clean_edges: bool = False,
) -> Plan:
    """Build the Sentinel-1 noise-power (NESZ/NEBZ/NEGZ) plan — the
    reference's second full processing chain after geocode
    (snap/util.py:706-876).

    Chain (each node conditional exactly where the reference inserts
    it): Read → Apply-Orbit-File → Calibration with ONLY the requested
    reference-area band enabled → ThermalNoiseRemoval with
    ``outputNoise=True`` (the node that turns the product into the
    noise-equivalent image) → TOPSAR-Deburst for IW/EW SLC →
    BandSelect on the ``NE{B|S|G}Z_{pol}`` bands → Multilook when the
    look factors exceed 1 (mli_parametrize, snap/auxil.py:1590-1650)
    → Terrain-Correction → Write.

    Raises exactly where the reference does: ``ValueError('refarea not
    supported')`` for an unknown reference area (snap/util.py:790-791)
    and ``RuntimeError`` for a non-Sentinel-1 sensor
    (snap/util.py:795-796). ``clean_edges`` is recorded on the Write
    node — the reference applies erosion in the post-``gpt`` writer
    step (snap/util.py:874-875), and the engine's executor mirrors
    that placement.
    """
    if refarea not in ("beta0", "sigma0", "gamma0"):
        raise ValueError("refarea not supported")
    if not isinstance(record, dict):
        raise TypeError("'record' must be a scene-contract dict")
    if record.get("sensor") not in ("S1A", "S1B", "S1C", "S1D"):
        raise RuntimeError("this function is for Sentinel-1 only")

    have = list(record.get("polarizations", []))
    pols = have if polarizations is None else [p for p in have if p in polarizations]
    if not pols:
        raise RuntimeError("no polarization in the source product matches the request")
    crs = _parse_t_srs(t_srs)

    p = Plan()
    p.add(Node("Read", "Read", {}, []))
    p.add(Node("Apply-Orbit-File", "Apply-Orbit-File", {}, ["Read"]))
    inband = refarea.capitalize()  # 'Sigma0' → outputSigmaBand
    cal_params = {
        "selectedPolarisations": pols,
        "outputBetaBand": False,
        "outputSigmaBand": False,
        "outputGammaBand": False,
        f"output{inband[:-1]}Band": True,
    }
    p.add(Node("Calibration", "Calibration", cal_params, ["Apply-Orbit-File"]))
    p.add(
        Node(
            "ThermalNoiseRemoval",
            "ThermalNoiseRemoval",
            {"outputNoise": True},
            ["Calibration"],
        )
    )
    last = "ThermalNoiseRemoval"
    if record.get("product") == "SLC" and record.get("acquisition_mode") in ("EW", "IW"):
        p.add(Node("TOPSAR-Deburst", "TOPSAR-Deburst", {}, [last]))
        last = "TOPSAR-Deburst"
    measure = f"NE{inband[0]}Z"
    p.add(
        Node(
            "BandSelect",
            "BandSelect",
            {"sourceBands": [f"{measure}_{pol}" for pol in pols]},
            [last],
        )
    )
    last = "BandSelect"
    # Multilook sizing (mli_parametrize): explicit looks override the
    # spacing-derived factors; a 1×1 result inserts no node.
    if rlks is None and azlks is None:
        from .functions.multilook import multilook_factors

        rlks, azlks = multilook_factors(
            source_rg=float(record.get("spacing_rg", 10.0)),
            source_az=float(record.get("spacing_az", 10.0)),
            target=float(spacing),
            geometry=record.get("image_geometry", "GROUND_RANGE"),
            incidence=float(record.get("incidence", 39.0)),
        )
    rlks, azlks = int(rlks or 1), int(azlks or 1)
    if rlks > 1 or azlks > 1:
        p.add(Node("Multilook", "Multilook", {"rg": rlks, "az": azlks}, [last]))
        last = "Multilook"
    p.add(Node("Terrain-Correction", "Terrain-Correction", {"crs": crs}, [last]))
    last = "Terrain-Correction"
    p.add(
        Node(
            "Write",
            "Write",
            {"file": "out", "formatName": "BEAM-DIMAP", "clean_edges": clean_edges},
            [last],
        )
    )
    return p
