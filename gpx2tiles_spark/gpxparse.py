"""Pure-Python GPX parse core — reference-faithful, batch-callable.

Re-implements the parse semantics of /root/reference/gpx.c on
``xml.etree`` (instead of libxml2 DOM), as a plain function over one
document's GPX span strings.  Used from Arrow-batched ``mapInPandas``
(see operators/parse.py) — one call per document, zero per-row Python UDFs.

Faithful quirks (each cited):
- segtab segment ordering: stack push ⇒ emitted head-first, i.e. custom
  srcs in *reverse first-seen* order, then gps, network, unknown
  (gpx.c:71-78, slist.h:28-45, gpx.c:363-377).
- ``<geoidheight>`` sets the ELE flag but stores to its own field
  (gpx.c:214-216).
- lat/lon dropped when unparseable or == +HUGE_VAL (only positive
  infinity is checked — gpx.c:320-331).
- consecutive-duplicate merge into the *previous* point + drop of the
  duplicate (gpx.c:343-355, merge gpx.c:114-154, compare gpx.c:157-181).
- pseudo-time ``str(ptcnt)`` for points without <time> (gpx.c:337-338);
  waypoints without time get "" (gpx.c:428-429).
- speed synthesis per segment with the sequential prev-feeds-next
  dependency, overwriting flags to SPEED only (gpx.c:273-299,363-373).
- time strings truncated to 23 chars (char[24] — gpx.h:52).
"""

from __future__ import annotations

import math
import re
from calendar import timegm
from dataclasses import dataclass, field
from time import strptime

# Presence bitmask, values exactly as gpx.h:31-39
PT_LATLON = 1
PT_ELE = 2
PT_COURSE = 4
PT_SPEED = 8
PT_HDOP = 16
PT_VDOP = 32
PT_PDOP = 64
PT_SAT = 128
PT_TIME = 256

SRC_GPS = "gps"
SRC_NETWORK = "network"
SRC_WAYPOINT = "<wpt>"
SRC_UNKNOWN = ""

_FLOAT_RE = re.compile(r"^\s*[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?")


@dataclass
class Point:
    flags: int = 0
    lat: float = 0.0
    lon: float = 0.0
    time: str = ""
    speed: float = 0.0
    sat: int = 0
    ele: float = 0.0
    geoidheight: float = 0.0
    course: float = 0.0
    hdop: float = 0.0
    vdop: float = 0.0
    pdop: float = 0.0


@dataclass
class Segment:
    src: str
    points: list[Point] = field(default_factory=list)


def _strtod(s: str | None) -> tuple[float, bool]:
    """C strtod semantics: parse a leading numeric prefix; (value, ok).

    ok=False ⇔ no conversion performed (err == nptr).  Also accepts
    inf/nan like strtod does."""
    if s is None:
        return 0.0, False
    st = s.strip().lower()
    for lit, v in (("+inf", math.inf), ("-inf", -math.inf), ("inf", math.inf),
                   ("+nan", math.nan), ("-nan", math.nan), ("nan", math.nan)):
        if st.startswith(lit):
            return v, True
    m = _FLOAT_RE.match(s)
    if not m:
        return 0.0, False
    try:
        return float(m.group(0)), True
    except ValueError:
        return 0.0, False


def _strtol(s: str | None) -> int:
    m = re.match(r"^\s*[+-]?\d+", s or "")
    return int(m.group(0)) if m else 0


def _local(tag) -> str:
    """Element local name, lowercased (xmlStrcasecmp is case-insensitive)."""
    if not isinstance(tag, str):
        return ""
    return tag.rsplit("}", 1)[-1].lower()


def _parse_point_children(el, pt: Point) -> str | None:
    """Child-element extraction of parse_trkpt (gpx.c:183-237).

    Returns the last <src> text (segment selector) or None."""
    src = None
    for ch in el:
        name = _local(ch.tag)
        text = ch.text or ""
        if name == "time":
            pt.flags |= PT_TIME
            pt.time = text[:23]
        elif name == "src":
            src = text
        elif name == "speed":
            pt.flags |= PT_SPEED
            pt.speed, _ = _strtod(text)
        elif name == "sat":
            pt.flags |= PT_SAT
            pt.sat = _strtol(text)
        elif name == "ele":
            pt.flags |= PT_ELE
            pt.ele, _ = _strtod(text)
        elif name == "geoidheight":
            pt.flags |= PT_ELE  # quirk: ELE flag, own field (gpx.c:214-216)
            pt.geoidheight, _ = _strtod(text)
        elif name == "course":
            pt.flags |= PT_COURSE
            pt.course, _ = _strtod(text)
        elif name == "hdop":
            pt.flags |= PT_HDOP
            pt.hdop, _ = _strtod(text)
        elif name == "vdop":
            pt.flags |= PT_VDOP
            pt.vdop, _ = _strtod(text)
        elif name == "pdop":
            pt.flags |= PT_PDOP
            pt.pdop, _ = _strtod(text)
        # unknown elements skipped (gpx.c:229-230)
    return src


def _parse_latlon(el, pt: Point) -> bool:
    """lat/lon attribute validation (gpx.c:320-331): drop on no-conversion
    or value == +inf (the reference checks only +HUGE_VAL)."""
    lat, ok = _strtod(el.get("lat"))
    if (lat == 0.0 and not ok) or lat == math.inf:
        return False
    lon, ok = _strtod(el.get("lon"))
    if (lon == 0.0 and not ok) or lon == math.inf:
        return False
    pt.lat, pt.lon = lat, lon
    pt.flags |= PT_LATLON
    return True


_CMP_FIELDS = [
    (PT_LATLON, lambda p: (p.lat, p.lon)),
    (PT_TIME, lambda p: p.time),
    (PT_ELE, lambda p: p.ele),
    (PT_COURSE, lambda p: p.course),
    (PT_SPEED, lambda p: p.speed),
    (PT_HDOP, lambda p: p.hdop),
    (PT_VDOP, lambda p: p.vdop),
    (PT_PDOP, lambda p: p.pdop),
    (PT_SAT, lambda p: p.sat),
]


def merge_points(dest: Point, src: Point) -> None:
    """Copy fields flagged in src but not dest into dest (gpx.c:114-154)."""
    flags = src.flags & ~dest.flags
    if flags & PT_LATLON:
        dest.lat, dest.lon = src.lat, src.lon
    if flags & PT_TIME:
        dest.time = src.time
    if flags & PT_ELE:
        dest.ele = src.ele
    if flags & PT_COURSE:
        dest.course = src.course
    if flags & PT_SPEED:
        dest.speed = src.speed
    if flags & PT_HDOP:
        dest.hdop = src.hdop
    if flags & PT_VDOP:
        dest.vdop = src.vdop
    if flags & PT_PDOP:
        dest.pdop = src.pdop
    if flags & PT_SAT:
        dest.sat = src.sat
    dest.flags |= flags


def compare_points(a: Point, b: Point) -> int:
    """Flags of a whose values equal b's (gpx.c:157-181)."""
    flags = a.flags & b.flags
    for bit, get in _CMP_FIELDS:
        if flags & bit and get(a) != get(b):
            flags &= ~bit
    return flags


def earth_distance(lat1, lon1, lat2, lon2) -> float:
    """Spherical law of cosines, R=6371000 (gpx.c:244-258)."""
    rad = math.pi / 180.0
    a = (math.sin(lat1 * rad) * math.sin(lat2 * rad)
         + math.cos(lat1 * rad) * math.cos(lat2 * rad)
         * math.cos((lon2 - lon1) * rad))
    return 6371000.0 * math.acos(a if a < 1.0 else 1.0)


def gpxtime2sec(t: str, local_time: bool = False) -> int | None:
    """Epoch seconds of an ISO stamp prefix; None if unparseable.

    The reference (gpx.c:260-271) interprets stamps via mktime in LOCAL
    time: the tm is seeded from gmtime(now) (tm_isdst == 0, i.e. forced
    standard time), strptime overwrites the date fields, mktime applies
    the process TZ's STANDARD offset.  ``local_time=True`` reproduces
    that bug-for-bug (mktime on a tm_isdst=0 struct).  The default keeps
    the engine's documented divergence — pinned UTC via timegm, identical
    to the reference under TZ=UTC and off by the standard offset (never
    the DST offset) elsewhere.  Fall-back "now" appears on both sides of
    every delta the reference computes, modeled as None (SURVEY §2.8 K6).
    """
    try:
        st = strptime(t[:19], "%Y-%m-%dT%H:%M:%S")
    except ValueError:
        return None
    if local_time:
        from time import mktime, struct_time

        # gmtime-seeded tm has tm_isdst = 0 (gpx.c:265) — force it
        return int(mktime(struct_time(st[:8] + (0,))))
    return timegm(st)


def synthesize_segment_speeds(points: list[Point], local_time: bool = False) -> None:
    """Sequential speed gap-fill of one segment (gpx.c:273-299,363-373)."""
    for i in range(1, len(points)):
        pt = points[i]
        if pt.flags & (PT_TIME | PT_SPEED) != PT_TIME:
            continue
        ppt = points[i - 1]
        nxt = points[i + 1] if i + 1 < len(points) else None
        pt.flags = PT_SPEED  # overwrite — loses LATLON/TIME (gpx.c:277)
        if (ppt.flags & PT_SPEED) and nxt is not None and (nxt.flags & PT_SPEED):
            pt.speed = (ppt.speed + nxt.speed) / 2.0
        else:
            d = earth_distance(ppt.lat, ppt.lon, pt.lat, pt.lon)
            t1 = gpxtime2sec(pt.time, local_time)
            t2 = gpxtime2sec(ppt.time, local_time)
            dt = (t1 - t2) if (t1 is not None and t2 is not None) else 0
            if dt < 1:
                dt = 1
            pt.speed = d / float(dt)


def process_trkseg(xseg, local_time: bool = False) -> list[Segment]:
    """One <trkseg> → ordered segments (process_trk_points, gpx.c:301-382)."""
    # segtab as an ordered stack: emitted head-first
    order: list[str] = [SRC_GPS, SRC_NETWORK, SRC_UNKNOWN]  # init_segtab push order reversed
    table: dict[str, Segment] = {}
    ptcnt = 0
    synspeed = False
    ppt: Point | None = None

    for xpt in xseg:
        if _local(xpt.tag) != "trkpt":
            continue  # warn+skip (gpx.c:316-319)
        pt = Point()
        if not _parse_latlon(xpt, pt):
            continue
        src = _parse_point_children(xpt, pt)
        key = src if src is not None else SRC_UNKNOWN
        if key not in order:
            order.insert(0, key)  # stack push: newest first (slist.h:28-33)
        if pt.flags & (PT_TIME | PT_SPEED) == PT_TIME:
            synspeed = True
        if not pt.flags & PT_TIME:
            pt.time = str(ptcnt)  # pseudo-time, flag NOT set (gpx.c:337-338)
        if ppt is not None:
            same = pt.flags & ppt.flags
            if (same & PT_LATLON and same & PT_TIME
                    and pt.lat == ppt.lat and pt.lon == ppt.lon
                    and pt.time == ppt.time):
                merge_points(ppt, pt)
            if compare_points(ppt, pt) == pt.flags:
                continue  # drop duplicate (gpx.c:352-354)
        table.setdefault(key, Segment(src=key)).points.append(pt)
        ppt = pt
        ptcnt += 1

    out = []
    for key in order:
        seg = table.get(key)
        if seg is None or not seg.points:
            continue
        if synspeed:
            synthesize_segment_speeds(seg.points, local_time)
        out.append(seg)
    return out


def parse_gpx_document(xml_texts: list[str], local_time: bool = False
                       ) -> tuple[str, list[Segment], list[Point], int]:
    """Parse one document's GPX span strings in span order.

    Returns (file_time, segments, waypoints, points_cnt) — the engine
    analog of gpx_read_file (gpx.c:444-492); unparseable spans are
    skipped (libxml2 runs in RECOVER mode; ElementTree is strict, and the
    deterministic corpus only emits well-formed fragments)."""
    import xml.etree.ElementTree as ET

    file_time = ""
    segments: list[Segment] = []
    wpts: list[Point] = []
    cnt = 0
    for xml_text in xml_texts:
        try:
            root = ET.fromstring(xml_text)
        except ET.ParseError:
            continue
        for el in root:
            name = _local(el.tag)
            if name == "time":
                file_time = (el.text or "")[:23]
            elif name == "wpt":
                pt = Point()
                if not _parse_latlon(el, pt):
                    continue
                _parse_point_children(el, pt)
                if not pt.flags & PT_TIME:
                    pt.time = ""  # gpx.c:428-429
                wpts.append(pt)
                cnt += 1
            elif name == "trk":
                for xseg in el:
                    if _local(xseg.tag) != "trkseg":
                        continue
                    segs = process_trkseg(xseg, local_time)
                    segments.extend(segs)
                    cnt += sum(len(s.points) for s in segs)
    return file_time, segments, wpts, cnt
