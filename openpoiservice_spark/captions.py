"""Caption codec — POI identity + tags packed into the `caption` column.

The engine's input table (BASELINE.json input_hint) carries POI attributes in
a single string column.  The canonical serialization (FIXTURES.md §2):

    osm_type=1;osm_id=2134315509;name=Ein Impfzentrum;amenity=vaccination_centre

`;`-separated `k=v` pairs, with `%xx` escaping of `%`, `;`, `=`.  The first
two fields are mandatory; the rest are OSM tags in insertion order.  Captions
must round-trip bit-exactly (per-row caption equality is a required invariant).

Decoding runs inside an Arrow-vectorized pandas UDF (see functions.py); the
pure-python functions here are the reference implementation used by the
synthesizer, the oracle, and the UDF itself (applied via pandas .map over the
Arrow batch — string parsing has no numpy fast path, but stays batch-local).

phash packing (FIXTURES.md §2): `phash = (lat_q << 32) | lon_q` with
`lat_q = uint32((lat + 90) * 1e7)`, `lon_q = uint32((lon + 180) * 1e7)`.
1e-7 deg ~= 1.1 cm, invisible at the reference's 6-decimal output truncation
(reference utils/geometries.py:7-15).
"""

from __future__ import annotations

import numpy as np

_ESC = {"%": "%25", ";": "%3B", "=": "%3D"}


def _escape(s: str) -> str:
    return s.replace("%", "%25").replace(";", "%3B").replace("=", "%3D")


def _unescape(s: str) -> str:
    return s.replace("%3D", "=").replace("%3B", ";").replace("%25", "%")


def encode_caption(osm_type: int, osm_id: int, tags: dict[str, str]) -> str:
    parts = [f"osm_type={int(osm_type)}", f"osm_id={int(osm_id)}"]
    parts += [f"{_escape(k)}={_escape(v)}" for k, v in tags.items()]
    return ";".join(parts)


def decode_caption(caption: str) -> tuple[int, int, dict[str, str]]:
    tags: dict[str, str] = {}
    osm_type = osm_id = 0
    for part in caption.split(";"):
        k, _, v = part.partition("=")
        k, v = _unescape(k), _unescape(v)
        if k == "osm_type":
            osm_type = int(v)
        elif k == "osm_id":
            osm_id = int(v)
        else:
            tags[k] = v
    return osm_type, osm_id, tags


def encode_phash(lon, lat) -> np.ndarray:
    """Vectorized (lon, lat) -> packed int64."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    lon_q = np.round((lon + 180.0) * 1e7).astype(np.int64) & 0xFFFFFFFF
    lat_q = np.round((lat + 90.0) * 1e7).astype(np.int64) & 0xFFFFFFFF
    return (lat_q << np.int64(32)) | lon_q


def decode_phash(phash) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized packed int64 -> (lon, lat). Pure numpy bit math — this is
    the body of the `decode_geo` pandas UDF (SURVEY.md §2.10 #1)."""
    p = np.asarray(phash, dtype=np.int64)
    lon = ((p & np.int64(0xFFFFFFFF)).astype(np.float64)) / 1e7 - 180.0
    lat = ((p >> np.int64(32)) & np.int64(0xFFFFFFFF)).astype(np.float64) / 1e7 - 90.0
    return lon, lat


def truncate6(x: float) -> float:
    """6-decimal *string-format* truncation of output coordinates — the
    reference formats, not rounds (reference utils/geometries.py:7-15,
    query_builder.py:227-229); replicated bit-for-bit (quirk Q6)."""
    return float(format(x, ".6f"))
