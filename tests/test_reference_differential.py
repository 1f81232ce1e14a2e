"""DIFFERENTIAL parity vs the reference's OWN line-extraction code.

The parity contract ("byte-identical extracted text per document",
BASELINE.json) is elsewhere pinned by fixtures modeled on the
reference's unit tests; here it is verified directly — the
reference's `lib/ocr_model.py` is IMPORTED (read-only, from
/root/reference, never copied) and run side-by-side with
`functions/xmlmodel.get_xml_lines` on every ALTO/PAGE document of
the generated corpus plus targeted RTL/min_len cases. Line ids,
line texts, and ALTO geometry must match byte-for-byte.

Only `lib.ocr_model` is importable in this container (pure
numpy/stdlib); `lib.ocr_step` needs lxml, so the reference's
`get_lines` namespace sniff (lxml `.xpath`) is bypassed by passing
our sniffed dialect prefix to `get_alto_lines` / `get_page_lines`
directly — those use `findall` + the prefix map, which the stdlib
ElementTree supports identically.
"""
import sys
import xml.etree.ElementTree as ET

import pytest

sys.path.insert(0, "/root/reference")

ref_model = pytest.importorskip("lib.ocr_model")

from ocr_pipeline_ray.functions.xmlmodel import (  # noqa: E402
    determine_dialect,
    get_xml_lines,
)


_RAISED = "<RuntimeError>"   # words-without-line-text error semantics


def _ref_lines(raw: bytes, min_len: int = 2, reorder: bool = False):
    """Run the REFERENCE extractor on stdlib-parsed XML."""
    root = ET.fromstring(raw)
    dialect = determine_dialect(root)
    assert dialect is not None
    tree = ET.ElementTree(root)   # get_page_lines' error path needs
    try:                          # .getroot() (ocr_model.py:236)
        if dialect.startswith("alto"):
            lines = ref_model.get_alto_lines(tree, dialect, min_len)
        else:
            lines = ref_model.get_page_lines(tree, dialect, min_len,
                                             reorder)
    except RuntimeError:
        return _RAISED
    except AttributeError:
        # the words-without-line-text error path reads the lxml-only
        # `.base` attribute while BUILDING its RuntimeError message
        # (ocr_model.py:236); on stdlib elements that read itself
        # raises — either way the reference is on its raise path
        return _RAISED
    # get_lines' final filter (ocr_model.py:214)
    return [ln for ln in lines if ln.valid]


def _our_lines(raw: bytes, min_len: int = 2, reorder: bool = False):
    try:
        lines, _dialect = get_xml_lines(raw, min_len=min_len,
                                        reorder=reorder)
    except RuntimeError:
        return _RAISED
    return lines


class TestReferenceDifferential:
    def test_corpus_alto_and_page_byte_identical(self, small_corpus):
        import pyarrow.parquet as pq

        from ocr_pipeline_ray.functions.xmlmodel import sniff_is_xml

        tbl = pq.read_table(list(small_corpus), columns=["html"])
        checked = {"alto": 0, "page": 0, "raised": 0}
        for raw in tbl.column("html").to_pylist():
            if raw is None or not sniff_is_xml(raw):
                continue
            ref = _ref_lines(raw)
            ours = _our_lines(raw)
            if ref == _RAISED or ours == _RAISED:
                # error-row semantics must agree too
                assert ref == ours == _RAISED
                checked["raised"] += 1
                continue
            assert [l.element_id for l in ref] == \
                [i for (i, _t, _g) in ours]
            assert [l.get_textline_content() for l in ref] == \
                [t for (_i, t, _g) in ours]
            d = determine_dialect(ET.fromstring(raw))
            checked["alto" if d.startswith("alto") else "page"] += 1
        assert checked["alto"] >= 3 and checked["page"] >= 3

    def test_alto_geometry_matches_reference_shape(self, small_corpus):
        import pyarrow.parquet as pq

        from ocr_pipeline_ray.functions.xmlmodel import sniff_is_xml

        tbl = pq.read_table(list(small_corpus), columns=["html"])
        checked = 0
        for raw in tbl.column("html").to_pylist():
            if raw is None or not sniff_is_xml(raw):
                continue
            d = determine_dialect(ET.fromstring(raw))
            if not d.startswith("alto"):
                continue
            for ref, (_i, _t, geom) in zip(_ref_lines(raw),
                                           _our_lines(raw)):
                (x1, y1), (x2, _), (_, y2), _ = ref.get_shape(ref.element)
                hpos, vpos, width, height = geom
                assert (hpos, vpos) == (x1, y1)
                assert (width, height) == (x2 - x1, y2 - y1)
            checked += 1
        assert checked >= 3

    def test_page_rtl_reorder_quirk(self):
        """reorder=True reverses PAGE token order via the reference's
        reduce quirk — both sides, byte-identical."""
        ns = "http://schema.primaresearch.org/PAGE/gts/pagecontent/2019-07-15"
        raw = (
            f'<?xml version="1.0"?><PcGts xmlns="{ns}"><Page>'
            '<TextRegion><TextLine id="l1">'
            '<Coords points="10,10 90,10 90,30 10,30"/>'
            '<Word id="w1"><Coords points="10,10 30,10 30,30 10,30"/>'
            "<TextEquiv><Unicode>eins</Unicode></TextEquiv></Word>"
            '<Word id="w2"><Coords points="40,10 60,10 60,30 40,30"/>'
            "<TextEquiv><Unicode>zwei</Unicode></TextEquiv></Word>"
            '<Word id="w3"><Coords points="70,10 90,10 90,30 70,30"/>'
            "<TextEquiv><Unicode>drei</Unicode></TextEquiv></Word>"
            "<TextEquiv><Unicode>eins zwei drei</Unicode></TextEquiv>"
            "</TextLine></TextRegion></Page></PcGts>"
        ).encode("utf-8")
        for reorder in (False, True):
            ref = _ref_lines(raw, reorder=reorder)
            ours = _our_lines(raw, reorder=reorder)
            assert [l.get_textline_content() for l in ref] == \
                [t for (_i, t, _g) in ours]
        assert _ref_lines(raw, reorder=True)[0].get_textline_content() \
            == "drei zwei eins"

    def test_page_marks_stripped_both_sides(self):
        """A 2-distinct-mark token exposes the reference's
        stale-variable quirk (only the LAST matching mark is
        removed, ocr_model.py:153-157) — both sides must reproduce
        it byte-identically (functions/text.strip_marks_pagequirk)."""
        ns = "http://schema.primaresearch.org/PAGE/gts/pagecontent/2013-07-15"
        raw = (
            f'<?xml version="1.0"?><PcGts xmlns="{ns}"><Page>'
            '<TextRegion><TextLine id="l1">'
            '<Coords points="10,10 90,10 90,30 10,30"/>'
            '<Word id="w1"><Coords points="10,10 30,10 30,30 10,30"/>'
            "<TextEquiv><Unicode>‏wort‎</Unicode></TextEquiv>"
            "</Word>"
            "<TextEquiv><Unicode>‏wort‎</Unicode></TextEquiv>"
            "</TextLine></TextRegion></Page></PcGts>"
        ).encode("utf-8")
        ref = _ref_lines(raw)
        ours = _our_lines(raw)
        # the RLM survives: 200e is last in iteration order here, so
        # its replace (reading the ORIGINAL token) wins
        assert [l.get_textline_content() for l in ref] == \
            ["‏wort"] == [t for (_i, t, _g) in ours]

    def test_min_len_filter_agrees(self):
        ns = "http://www.loc.gov/standards/alto/ns-v3#"
        raw = (
            f'<?xml version="1.0"?><alto xmlns="{ns}"><Layout><Page>'
            "<PrintSpace>"
            '<TextLine ID="l1" HPOS="0" VPOS="0" WIDTH="10" HEIGHT="5">'
            '<String CONTENT="a"/></TextLine>'
            '<TextLine ID="l2" HPOS="0" VPOS="10" WIDTH="10" HEIGHT="5">'
            '<String CONTENT="ab"/></TextLine>'
            '<TextLine ID="l3" HPOS="0" VPOS="20" WIDTH="10" HEIGHT="5">'
            '<String CONTENT="x"/><String CONTENT="y"/></TextLine>'
            "</PrintSpace></Page></Layout></alto>"
        ).encode("utf-8")
        for min_len in (1, 2, 3, 4):
            ref = _ref_lines(raw, min_len=min_len)
            ours = _our_lines(raw, min_len=min_len)
            assert [l.element_id for l in ref] == \
                [i for (i, _t, _g) in ours], min_len
            assert [l.get_textline_content() for l in ref] == \
                [t for (_i, t, _g) in ours], min_len


class TestScalarDifferential:
    """§2.8 scalar functions vs the reference's own implementations."""

    @staticmethod
    def _ref_center(points_attr):
        return ref_model.coords_center(points_attr.split())

    def test_coords_center_matches(self):
        from ocr_pipeline_ray.functions.xmlmodel import coords_center

        cases = [
            "10,10 90,10 90,30 10,30",
            "0,0",
            "1,2 3,4 5,6",
            "100,200 300,400 500,600 700,800 900,1000",
            "7,3 7,3 7,3",
        ]
        for attr in cases:
            ours = coords_center(attr)
            ref = self._ref_center(attr)
            assert ours == ref, attr
        # empty attr: ours returns None; the reference's raw helper
        # on an empty token list divides by zero upstream — its
        # caller (to_center_coords) guards with `len(tokens) > 0`
        # and returns None, which is the behavior mirrored here
        assert coords_center("") is None

    def test_to_center_coords_matches_on_elements(self):
        from ocr_pipeline_ray.functions.xmlmodel import coords_center

        ns = "http://schema.primaresearch.org/PAGE/gts/pagecontent/2019-07-15"
        el = ET.fromstring(
            f'<Word xmlns="{ns}" id="w1">'
            '<Coords points="10,10 30,50 50,90"/></Word>'
        )
        ref = ref_model.to_center_coords(el, "page2019")
        ours = coords_center("10,10 30,50 50,90")
        assert ref == ours[0]                      # horizontal center
        ref_v = ref_model.to_center_coords(el, "page2019",
                                           vertical=True)
        assert ref_v == ours[1]                    # vertical center
