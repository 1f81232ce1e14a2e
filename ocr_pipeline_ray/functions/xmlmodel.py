"""ALTO / PAGE XML text-line extraction — the reference's data model.

Re-states `/root/reference/lib/ocr_model.py` from scratch on stdlib
``xml.etree.ElementTree`` (no lxml in this environment): namespace
sniffing across the four dialects (ALTO v3/v4, PAGE 2013/2019,
``ocr_model.py:16-20``), per-dialect line extraction with the
reference's exact semantics:

* ALTO (``get_alto_lines``, ``ocr_model.py:217-223``): a TextLine
  qualifies iff the space-join of its ``String@CONTENT`` values has
  length >= min_len; text = joined CONTENT; geometry from
  HPOS/VPOS/WIDTH/HEIGHT (``ALTOLine.get_shape``, ``:93-98``).
* PAGE (``get_page_lines``, ``:226-245``): the line's
  ``TextEquiv/Unicode`` is preferred; a line that has Word elements
  but NO line-level text raises (reference ``RuntimeError`` →
  skip-document semantics). Word tokens are sorted by center-x of
  their Coords polygon (center-y when vertical,
  ``to_center_coords``/``coords_center``, ``:181-200``); direction /
  zero-width marks are stripped (``:153-157``); a line whose Coords
  are missing/empty is marked invalid and dropped (``:134-141,214``);
  ``reorder`` reverses token order (``:66-69``).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import List, Optional, Tuple

from .text import strip_marks_pagequirk

XML_NS = {
    "alto3": "http://www.loc.gov/standards/alto/ns-v3#",
    "alto4": "http://www.loc.gov/standards/alto/ns-v4#",
    "page2013": "http://schema.primaresearch.org/PAGE/gts/pagecontent/2013-07-15",
    "page2019": "http://schema.primaresearch.org/PAGE/gts/pagecontent/2019-07-15",
}
_URI_TO_DIALECT = {v: k for k, v in XML_NS.items()}

# geometry tuple: (hpos, vpos, width, height)
Geom = Tuple[int, int, int, int]


def _root_namespace(root: ET.Element) -> Optional[str]:
    tag = root.tag
    if tag.startswith("{"):
        return tag[1:].split("}", 1)[0]
    return None


def determine_dialect(root: ET.Element) -> Optional[str]:
    """Namespace sniff (``_determine_namespace``, ocr_model.py:176-178)."""
    return _URI_TO_DIALECT.get(_root_namespace(root))


def coords_center(points_attr: str) -> Optional[Tuple[float, float]]:
    """Mean point of a PAGE Coords@points list (ocr_model.py:181-200)."""
    tokens = points_attr.split()
    if not tokens:
        return None
    xs, ys = [], []
    for token in tokens:
        parts = token.split(",")
        xs.append(int(parts[0]))
        ys.append(int(parts[1]))
    return (sum(xs) / len(xs), sum(ys) / len(ys))


def _bbox_from_points(points_attr: str) -> Optional[Geom]:
    tokens = points_attr.split()
    if not tokens:
        return None
    xs, ys = [], []
    for token in tokens:
        parts = token.split(",")
        xs.append(int(parts[0]))
        ys.append(int(parts[1]))
    return (min(xs), min(ys), max(xs) - min(xs), max(ys) - min(ys))


def _to_center(elem: ET.Element, ns: str, vertical: bool) -> Optional[float]:
    coords = elem.find(f"{{{ns}}}Coords")
    if coords is None:
        return None
    center = coords_center(coords.attrib.get("points", ""))
    if center is None:
        return None
    return center[1] if vertical else center[0]


def get_alto_lines(
    root: ET.Element, ns_uri: str, min_len: int
) -> List[Tuple[str, str, Geom]]:
    """→ [(line_id, text, geom)] — ALTO dialect."""
    out = []
    for line in root.iter(f"{{{ns_uri}}}TextLine"):
        contents = [
            s.attrib.get("CONTENT", "")
            for s in line.findall(f"{{{ns_uri}}}String")
        ]
        joined = " ".join(contents)
        if len(joined) < min_len:
            continue
        hpos = int(line.attrib.get("HPOS", 0))
        vpos = int(line.attrib.get("VPOS", 0))
        width = int(line.attrib.get("WIDTH", 0))
        height = int(line.attrib.get("HEIGHT", 0))
        out.append(
            (line.attrib.get("ID", ""), joined, (hpos, vpos, width, height))
        )
    return out


def get_page_lines(
    root: ET.Element, ns_uri: str, min_len: int, reorder: bool,
    vertical: bool = False,
) -> List[Tuple[str, str, Geom]]:
    """→ [(line_id, text, geom)] — PAGE dialect.

    Word tokens sorted by polygon center; invalid-coords lines
    dropped; words-without-line-text raises RuntimeError (reference
    skip-document semantics).
    """
    out = []
    for line in root.iter(f"{{{ns_uri}}}TextLine"):
        line_id = line.attrib.get("id", "")
        text_equiv = line.find(
            f"{{{ns_uri}}}TextEquiv/{{{ns_uri}}}Unicode"
        )
        line_text = text_equiv.text if text_equiv is not None else None
        if not line_text:
            words_with_text = line.findall(
                f"{{{ns_uri}}}Word/{{{ns_uri}}}TextEquiv/{{{ns_uri}}}Unicode"
            )
            if words_with_text:
                raise RuntimeError(
                    f"just words for line '{line_id}'"
                )
            continue
        stripped = line_text.strip()
        if not stripped or len(stripped) < min_len:
            continue

        word_els = line.findall(f"{{{ns_uri}}}Word")
        tokens: List[str] = []
        if word_els:
            centered = []
            for word in word_els:
                center = _to_center(word, ns_uri, vertical)
                if center is None:
                    raise RuntimeError(
                        f"Invalid Coords of Word "
                        f"'{word.attrib.get('id', '')}' in '{line_id}'!"
                    )
                centered.append((center, word))
            centered.sort(key=lambda pair: int(pair[0]))
            for _, word in centered:
                unicode_el = word.find(
                    f"{{{ns_uri}}}TextEquiv/{{{ns_uri}}}Unicode"
                )
                if unicode_el is not None and unicode_el.text:
                    # reference parity: a token EMPTIED by mark
                    # stripping stays in the list, so the join yields
                    # double spaces (lib/ocr_model.py:144-157 keeps
                    # the replaced string in text_words)
                    tokens.append(strip_marks_pagequirk(unicode_el.text.strip()))
        else:
            # no Word elements: the line itself must carry valid coords
            center = _to_center(line, ns_uri, vertical)
            if center is None:
                continue  # invalid coords → line dropped (valid=False)
            # reference parity: the whole line text is ONE token
            # (lib/ocr_model.py:119-126 appends the TextLine element
            # itself), so inner runs of spaces survive and RTL
            # reordering is a no-op for word-less lines
            tokens = [strip_marks_pagequirk(stripped)]

        if reorder:
            tokens = list(reversed(tokens))

        coords = line.find(f"{{{ns_uri}}}Coords")
        geom: Geom = (0, 0, 0, 0)
        if coords is not None:
            bbox = _bbox_from_points(coords.attrib.get("points", ""))
            if bbox is not None:
                geom = bbox
        out.append((line_id, " ".join(tokens), geom))
    return out


def get_xml_lines(
    xml_bytes: bytes, min_len: int = 2, reorder: bool = False
) -> Tuple[List[Tuple[str, str, Geom]], str]:
    """Dispatch on sniffed namespace → (lines, dialect).

    Raises ``ET.ParseError`` on malformed XML and ``RuntimeError`` on
    the PAGE words-without-line-text condition — both map to the
    engine's error-column (skip-document) semantics. An unknown
    namespace yields no lines (reference returns an empty line list).
    """
    root = ET.fromstring(xml_bytes)
    dialect = determine_dialect(root)
    if dialect is None:
        return [], "unknown"
    ns_uri = XML_NS[dialect]
    if dialect.startswith("alto"):
        return get_alto_lines(root, ns_uri, min_len), dialect
    return get_page_lines(root, ns_uri, min_len, reorder), dialect


def sniff_is_xml(raw: bytes) -> bool:
    """Cheap dispatch: ALTO/PAGE documents vs HTML pages."""
    head = raw[:256].lstrip()
    if not head.startswith(b"<?xml") and not head.startswith(b"<alto") \
            and not head.startswith(b"<PcGts"):
        return False
    probe = raw[:2048]
    return (b"loc.gov/standards/alto" in probe
            or b"schema.primaresearch.org/PAGE" in probe)
