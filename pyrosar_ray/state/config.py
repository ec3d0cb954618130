"""Engine configuration state: INI store, properties files, install checks.

Engine twin of the reference's configuration surface — the pieces of
``config.ConfigHandler`` (/root/reference/pyroSAR/config.py:44-263),
``examine.ExamineSnap`` / ``examine.SnapProperties``
(/root/reference/pyroSAR/examine.py:32-691) and
``examine.ExamineGamma`` (examine.py:402-471) that carry testable
semantics rather than subprocess calls:

- :class:`EngineConfig` — a persistent INI-backed key/value store with
  the reference's exact error surfaces (missing section → AttributeError,
  duplicate section/value → RuntimeError, list values JSON-encoded).
- :class:`PropertiesStore` — the layered java-properties model: an
  install ``etc/`` overlaid by a user directory, values decoded to
  Python scalars, writes always landing in the user layer with
  comment-preserving in-place key replacement.
- :data:`SNAP_SUFFICES` / :func:`get_suffix` — the authoritative
  operator → filename-suffix table (the content of the reference's
  ``snap.suffices.properties`` data file; factual ESA SNAP operator
  names, ``get_suffix`` returns None for unknown operators).
- :func:`examine_snap_install` — the install-layout verification rule:
  a candidate executable identifies a SNAP installation iff the
  relative ``etc/`` directory with the four expected config files and a
  ``gpt`` executable exist next to it (examine.py:122-178). The engine
  takes explicit candidate roots instead of scanning ``$PATH`` — no
  deployment of this engine ships SNAP, so discovery is a pure layout
  predicate here.
- :func:`gamma_version` — the GAMMA home-directory version grammar
  (``GAMMA_SOFTWARE[-/]YYYYMMDD``, examine.py:438-439).

None of this holds distributed state: configuration is read on the
driver and shipped to stages via plain parameters / ``ray.put``.
"""

from __future__ import annotations

import configparser
import json
import os
import re

# ---------------------------------------------------------------- suffices

#: operator → product filename suffix (reference data file
#: ``snap/data/snap.suffices.properties``; used by ``Workflow.suffix``
#: via ``ExamineSnap.get_suffix``, snap/auxil.py:1114-1139)
SNAP_SUFFICES: dict[str, str] = {
    "AdaptiveThresholding": "THR",
    "ALOS-Deskewing": "DSk",
    "Apply-Orbit-File": "Orb",
    "Back-Geocoding": "Stack",
    "Calibration": "Cal",
    "Coherence": "Coh",
    "CP-Stokes-Parameters": "Stokes",
    "CreateStack": "Stack",
    "DEM-Assisted-Coregistration": "Stack",
    "Demodulate": "Demod",
    "Ellipsoid-Correction-GG": "EC",
    "Ellipsoid-Correction-RD": "EC",
    "Flip": "Flip",
    "GLCM": "GLCM",
    "GoldsteinPhaseFiltering": "Flt",
    "HorizontalVerticalMotion": "hvm",
    "Interferogram": "Ifg",
    "IonosphericCorrection": "iono",
    "KNN-Classifier": "KNNClass",
    "LinearToFromdB": "dB",
    "Maximum-Likelihood-Classifier": "MLClass",
    "Minimum-Distance-Classifier": "MDClass",
    "Multi-Temporal-Speckle-Filter": "Spk",
    "Multilook": "ML",
    "MultiMasterInSAR": "mmifg",
    "Multitemporal-Compositing": "MC",
    "Naive-Bayes-Classifier": "NB",
    "Object-Discrimination": "SHP",
    "Offset-Tracking": "Vel",
    "Oversample": "Ovr",
    "PhaseFilter": "Flt",
    "PhaseToDisplacement": "Disp",
    "PhaseToElevation": "Hgt",
    "PhaseToHeight": "Hgt",
    "Polarimetric-Classification": "Class",
    "Polarimetric-Parameters": "PP",
    "Polarimetric-Speckle-Filter": "Spk",
    "Random-Forest-Classifier": "RF",
    "Remodulate": "Remod",
    "SARSim-Terrain-Correction": "TC",
    "SliceAssembly": "Asm",
    "SM-Dielectric-Modeling": "SM",
    "Speckle-Divergence": "SpkDiv",
    "Speckle-Filter": "Spk",
    "SRGR": "SRGR",
    "Supervised-Wishart-Classification": "Class",
    "SVM-Classifier": "SVMClass",
    "Terrain-Correction": "TC",
    "Terrain-Flattening": "TF",
    "ThermalNoiseRemoval": "NR",
    "Three-passDInSAR": "DInSAR",
    "TopoPhaseRemoval": "DInSAR",
    "TOPSAR-Deburst": "Deb",
    "TOPSAR-Merge": "mrg",
    "Undersample": "Udr",
}


def get_suffix(operator: str) -> str | None:
    """File-name suffix for an operator; None when the operator has no
    registered suffix (``ExamineSnap.get_suffix``, examine.py:287-311 —
    unknown operators contribute nothing to product names)."""
    return SNAP_SUFFICES.get(operator)


# ------------------------------------------------------------- INI store


class EngineConfig:
    """Persistent INI-backed configuration store.

    The reference's ``ConfigHandler`` semantics (config.py:44-263) with
    an explicit path instead of a hard-wired home-directory singleton —
    callers that want process-wide sharing use :func:`engine_config`.
    Option keys are case-sensitive; list values are JSON-encoded; every
    mutation persists immediately.
    """

    def __init__(self, path: str | None = None, config_fname: str = "config.ini"):
        root = path or os.path.join(os.path.expanduser("~"), ".pyrosar")
        self._file = os.path.join(root, config_fname)
        self.parser = configparser.RawConfigParser(allow_no_value=True)
        self.parser.optionxform = str
        if os.path.isfile(self._file):
            self.parser.read(self._file, encoding="utf8")

    @property
    def file(self) -> str:
        return self._file

    @property
    def sections(self) -> list[str]:
        return self.parser.sections()

    def keys(self, section: str) -> list[str]:
        return self.parser.options(section)

    def __contains__(self, section: str) -> bool:
        return self.parser.has_section(section)

    def __getitem__(self, section: str) -> dict[str, str]:
        if not self.parser.has_section(section):
            raise AttributeError(f"Section {section} does not exist.")
        return dict(self.parser.items(section))

    def __str__(self) -> str:
        lines = [
            f"Class    : {type(self).__name__}",
            f"Path     : {self._file}",
            f"Sections : {len(self.sections)}",
            "Contents :",
        ]
        for section in self.sections:
            lines.append(f"  Section: {section}")
            for key, value in self.parser.items(section):
                lines.append(f"    x {key} :: {value}")
        return "\n".join(lines)

    def add_section(self, section: str) -> None:
        if self.parser.has_section(section):
            raise RuntimeError("section already exists")
        self.parser.add_section(section)
        self.write()

    def set(self, section: str, key: str, value, overwrite: bool = False) -> None:
        if not self.parser.has_section(section):
            raise AttributeError(f"Section {section} does not exist.")
        if isinstance(value, list):
            value = json.dumps(value)
        if key in self.parser.options(section) and not overwrite:
            raise RuntimeError("Value already exists.")
        self.parser.set(section, key, value)
        self.write()

    def remove_option(self, section: str, key: str) -> None:
        if not self.parser.has_section(section):
            raise AttributeError(f"Section {section} does not exist.")
        if key not in self.parser.options(section):
            raise AttributeError(f"Key {key} does not exist.")
        self.parser.remove_option(section, key)
        self.write()

    def remove_section(self, section: str) -> None:
        self.parser.remove_section(section)
        self.write()

    def write(self) -> None:
        os.makedirs(os.path.dirname(self._file), exist_ok=True)
        with open(self._file, "w", encoding="utf8") as out:
            self.parser.write(out)


_shared_config: EngineConfig | None = None


def engine_config(path: str | None = None) -> EngineConfig:
    """Process-wide shared :class:`EngineConfig` (the reference makes
    ``ConfigHandler`` a metaclass singleton; the engine shares one
    instance per process, re-keyed when a different path is asked for)."""
    global _shared_config
    if _shared_config is None or (
        path is not None
        and _shared_config.file != os.path.join(path, "config.ini")
    ):
        _shared_config = EngineConfig(path)
    return _shared_config


# ------------------------------------------------------- properties files

_PROP_LINE = re.compile(
    r'^(?P<comment>#?)(?P<key>[\w.]+)[ ]*=[ ]*"?(?P<value>[^"\n]*)"?$'
)


def decode_property(raw: str):
    """java-properties value → Python scalar: none/true/false words,
    int, float, else string with ``\\:`` and ``\\\\`` unescaped
    (``SnapProperties._string_convert``, examine.py:637-651)."""
    low = raw.lower()
    if low == "none":
        return None
    if low == "true":
        return True
    if low == "false":
        return False
    try:
        return int(raw)
    except ValueError:
        pass
    try:
        return float(raw)
    except ValueError:
        pass
    return raw.replace("\\:", ":").replace("\\\\", "\\")


def encode_property(value) -> str:
    """Python value → java-properties text: lists join on space, then
    unicode-escape + ``:`` escaping (examine.py:569-573)."""
    if isinstance(value, list):
        value = " ".join(value)
    return str(value).encode("unicode-escape").decode().replace(":", "\\:")


def read_properties(path: str, str_split: dict[str, str] | None = None) -> dict:
    """One properties file → dict. Commented keys (``#key = ...``) map
    to None; ``str_split`` turns selected values into lists."""
    out: dict = {}
    if not os.path.isfile(path):
        return out
    with open(path, "r", encoding="utf8") as f:
        for line in f:
            m = _PROP_LINE.match(line.rstrip("\n"))
            if not m:
                continue
            key, raw = m.group("key"), m.group("value")
            if m.group("comment"):
                out[key] = None
            elif str_split and key in str_split:
                out[key] = raw.split(str_split[key])
            else:
                out[key] = decode_property(raw)
    return out


class PropertiesStore:
    """Layered SNAP-style properties: install ``etc/`` + user overlay.

    ``SnapProperties`` semantics (examine.py:472-691) with the user
    directory an explicit argument (the reference hard-codes
    ``~/.snap``): reads see the user layer over the install layer;
    writes ALWAYS land in the user layer, replacing the key's line in
    place when present (a ``None`` value re-comments the key), else
    appending — the install directory is never modified.
    """

    #: file name → value-splitting rules (snap.conf's space-separated
    #: java options list, examine.py:515-517)
    FILES = ("snap.properties", "snap.auxdata.properties", "snap.conf")
    _SPLIT = {"snap.conf": {"default_options": " "}}

    def __init__(self, install_path: str, user_path: str):
        self.install_etc = os.path.join(install_path, "etc")
        self.user_etc = os.path.join(user_path, "etc")
        self.layers: dict[str, dict] = {}
        for fname in self.FILES:
            split = self._SPLIT.get(fname)
            merged = read_properties(os.path.join(self.install_etc, fname), split)
            merged.update(read_properties(os.path.join(self.user_etc, fname), split))
            self.layers[fname] = merged

    def keys(self) -> list[str]:
        out: list[str] = []
        for d in self.layers.values():
            out.extend(d.keys())
        return sorted(out)

    def _file_of(self, key: str) -> str | None:
        for fname, d in self.layers.items():
            if key in d:
                return fname
        return None

    def __getitem__(self, key: str):
        fname = self._file_of(key)
        if fname is None:
            raise KeyError(f"could not find key {key}")
        val = self.layers[fname][key]
        return val.copy() if hasattr(val, "copy") else val

    def __setitem__(self, key: str, value) -> None:
        if not (isinstance(value, (int, float, str, list)) or value is None):
            raise TypeError(f"invalid type for key {key}: {type(value)}")
        fname = self._file_of(key) or "snap.conf"
        self.layers[fname][key] = value
        path = os.path.join(self.user_etc, fname)
        content = ""
        if os.path.isfile(path):
            with open(path, "r", encoding="utf8") as f:
                content = f.read()
        if value is None:
            repl = f"#{key} ="
        else:
            repl = f"{key} = {encode_property(value)}"
        pattern = re.compile(rf"^#?{re.escape(key)}[ ]*=.*$", re.M)
        if pattern.search(content):
            content = pattern.sub(repl, content, count=1)
        else:
            content += f"\n{repl}"
        os.makedirs(self.user_etc, exist_ok=True)
        with open(path, "w", encoding="utf8") as f:
            f.write(content)

    @property
    def userpath(self) -> str:
        """The auxdata user directory: ``snap.userdir`` if set, else the
        user layer's root (examine.py:667-675)."""
        try:
            val = self["snap.userdir"]
        except KeyError:
            val = None
        return val if val is not None else os.path.dirname(self.user_etc)

    @userpath.setter
    def userpath(self, value: str) -> None:
        self["snap.userdir"] = value


# ------------------------------------------------------ install layouts

#: files that must exist inside ``etc/`` for a root to count as a SNAP
#: install (examine.py:160-162)
_SNAP_ETC_EXPECTED = (
    "snap.auxdata.properties",
    "snap.clusters",
    "snap.conf",
    "snap.properties",
)


def examine_snap_install(candidates: list[str]) -> dict | None:
    """First candidate executable that sits inside a real SNAP layout.

    The reference's confirmation rule (examine.py:122-178): resolve
    symlinks, require ``<root>/etc`` with the four expected config
    files, and a ``gpt``/``gpt.exe`` executable somewhere under the
    executable's directory. Returns ``{'path', 'etc', 'gpt'}`` or None.
    """
    for cand in candidates:
        if not os.path.isfile(cand):
            continue
        path = os.path.realpath(cand) if os.path.islink(cand) else cand
        root = os.path.dirname(os.path.dirname(path))
        etc = os.path.join(root, "etc")
        if not os.path.isdir(etc):
            continue
        present = set(os.listdir(etc))
        if not all(name in present for name in _SNAP_ETC_EXPECTED):
            continue
        bindir = os.path.dirname(path)
        gpt = None
        for name in ("gpt", "gpt.exe"):
            p = os.path.join(bindir, name)
            if os.path.isfile(p):
                gpt = p
                break
        if gpt is None:
            continue
        return {"path": path, "etc": etc, "gpt": gpt}
    return None


_GAMMA_VERSION = re.compile(r"GAMMA_SOFTWARE[-/](?P<version>[0-9]{8})")


def gamma_version(home: str) -> str:
    """YYYYMMDD version stamp from a GAMMA home path
    (``ExamineGamma``, examine.py:438-439). Raises RuntimeError when the
    path does not follow the install-directory grammar."""
    m = _GAMMA_VERSION.search(home)
    if m is None:
        raise RuntimeError(
            f"could not parse a GAMMA version from '{home}' "
            "(expected .../GAMMA_SOFTWARE-YYYYMMDD)"
        )
    return m.group("version")


def examine_gamma(config: EngineConfig, home: str | None = None) -> dict:
    """Resolve the GAMMA home/version into the config store.

    ``ExamineGamma`` flow (examine.py:415-447) with the environment
    lookup replaced by an explicit ``home`` argument: a configured home
    that disagrees with the given one is overwritten (the reference also
    clears its parsed-module cache there); no home anywhere raises the
    reference's error.
    """
    configured = config["GAMMA"].get("home") if "GAMMA" in config.sections else None
    resolved = home or configured
    if resolved is None:
        raise RuntimeError("could not read GAMMA installation directory")
    version = gamma_version(resolved)
    if "GAMMA" not in config.sections:
        config.add_section("GAMMA")
    for key, value in (("home", resolved), ("version", version)):
        if config["GAMMA"].get(key) != value:
            config.set("GAMMA", key, value, overwrite=True)
    return {"home": resolved, "version": version}
