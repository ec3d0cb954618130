"""Structurally-real scene format grammars (SAFE, CEOS_PSR, ESA, TSX).

Each module pairs a deterministic blob *builder* (test/bench fixture
synthesis — real structure, synthetic content) with the *parser* the
engine registers as a format driver. Parsers emit the full 16-attribute
scene contract (catalog.schema.LOCAL_ATTRS) plus format extras.

Reference grammars: /root/reference/pyroSAR/drivers.py
  SAFE      drivers.py:1880-2299  (manifest + annotation XML)
  CEOS_PSR  drivers.py:1093-1460  (big-endian CEOS leader records)
  ESA       drivers.py:1578-1812  (MPH/SPH text + binary geolocation ADS)
  TSX/TDM   drivers.py:2303-2525  (annotation XML + GEOREF grid)
"""

from .ceos_ers import build_ceos_ers_blob, parse_ceos_ers, sniff_ceos_ers
from .ceos_psr import build_ceos_psr_blob, parse_ceos_psr, sniff_ceos_psr
from .common import WKT4326, parse_date
from .dimap import build_dimap_blob, parse_dimap, sniff_dimap
from .eorc_psr import build_eorc_psr_blob, parse_eorc_psr, sniff_eorc_psr
from .esa import build_esa_blob, parse_esa, sniff_esa
from .safe import build_safe_blob, parse_safe, safe_geo_grid, sniff_safe
from .tsx import build_tsx_blob, parse_tsx, sniff_tsx

__all__ = [
    "WKT4326",
    "parse_date",
    "build_safe_blob",
    "parse_safe",
    "safe_geo_grid",
    "sniff_safe",
    "build_ceos_psr_blob",
    "parse_ceos_psr",
    "sniff_ceos_psr",
    "build_dimap_blob",
    "parse_dimap",
    "sniff_dimap",
    "build_ceos_ers_blob",
    "parse_ceos_ers",
    "sniff_ceos_ers",
    "build_eorc_psr_blob",
    "parse_eorc_psr",
    "sniff_eorc_psr",
    "build_esa_blob",
    "parse_esa",
    "sniff_esa",
    "build_tsx_blob",
    "parse_tsx",
    "sniff_tsx",
]
