"""PDF writer + parser (functions/pdf.py) and its pipeline dispatch.

The oracle query (extraction_pdf_roundtrip) pins the happy path at
corpus scale; these tests pin the parser features the corpus never
produces: escape sequences, octal, hex/UTF-16 strings, TJ arrays,
Tm positioning, ' and " operators, content-stream arrays,
uncompressed streams, malformed input → error-row semantics.
"""

import pyarrow as pa
import pytest

from ocr_pipeline_ray.functions.pdf import (
    PdfError,
    doc_to_pdf,
    extract_page_text,
    pdf_text_lines,
    sniff_is_pdf,
)


def _texts(pdf: bytes, **kw):
    lines, _n = pdf_text_lines(pdf, **kw)
    return [t for (_i, t, _g) in lines]


class TestWriterParserRoundtrip:
    def test_multipage_roundtrip_and_ids(self):
        lines = [f"inhalt zeile nummer {i} lorem ipsum" for i in range(11)]
        pdf = doc_to_pdf(lines, lines_per_page=4)
        got, n_pages = pdf_text_lines(pdf)
        assert n_pages == 3
        assert [t for (_i, t, _g) in got] == lines
        assert got[0][0] == "p0000_l00000"
        assert got[4][0].startswith("p0001_")
        assert got[8][0].startswith("p0002_")

    def test_escapes_roundtrip(self):
        lines = ["mit (klammern) und \\ backslash",
                 "tab\there und newline ersatz",
                 "prozent % und // slashes <spitz>"]
        assert _texts(doc_to_pdf(lines)) == lines

    def test_unicode_hex_string_roundtrip(self):
        lines = ["übermäßig schön €42 ÄÖÜ", "plain ascii zeile"]
        assert _texts(doc_to_pdf(lines)) == lines

    def test_uncompressed_stream(self):
        lines = ["eins zwei drei", "vier fünf sechs"]
        pdf = doc_to_pdf(lines, compress=False)
        assert b"/FlateDecode" not in pdf
        assert _texts(pdf) == lines

    def test_empty_doc_one_blank_page(self):
        got, n_pages = pdf_text_lines(doc_to_pdf([]))
        assert got == [] and n_pages == 1

    def test_min_len_drops_short_lines(self):
        pdf = doc_to_pdf(["a", "lange zeile bleibt", "b"])
        assert _texts(pdf, min_len=2) == ["lange zeile bleibt"]
        assert _texts(pdf, min_len=1) == ["a", "lange zeile bleibt", "b"]

    def test_geometry_is_real_layout(self):
        pdf = doc_to_pdf(["erste zeile", "zweite zeile"],
                         font_size=12, leading=14, page_h=792)
        lines, _ = pdf_text_lines(pdf)
        (h0, v0, w0, s0), (h1, v1, w1, s1) = lines[0][2], lines[1][2]
        assert h0 == h1 == 72            # left margin from 72 y Td
        assert v1 - v0 == 14             # one leading step down the page
        assert s0 == s1 == 12            # font size as line height
        assert w0 > 0 and w1 > 0


class TestContentStreamInterpreter:
    def test_tm_positioning_and_tj_array(self):
        content = (b"BT /F1 10 Tf 12 TL "
                   b"1 0 0 1 100 700 Tm [(kern) -20 (ed pair)] TJ "
                   b"T* (zweite zeile) Tj ET")
        shows = extract_page_text(content)
        assert [(s[3]) for s in shows] == ["kerned pair", "zweite zeile"]
        assert shows[0][:2] == (700.0, 100.0)
        assert shows[1][0] == 688.0  # 700 - TL 12

    def test_quote_operators_advance_line(self):
        content = (b"BT /F1 10 Tf 14 TL 72 720 Td (erste) Tj "
                   b"(zweite)' 2 3 (dritte)\" ET")
        shows = extract_page_text(content)
        assert [s[3] for s in shows] == ["erste", "zweite", "dritte"]
        assert [s[0] for s in shows] == [720.0, 706.0, 692.0]

    def test_octal_and_continuation_escapes(self):
        content = b"BT 0 TL (oktal \\101\\102 und wei\\\nter) Tj ET"
        shows = extract_page_text(content)
        assert shows[0][3] == "oktal AB und weiter"

    def test_text_outside_bt_et_ignored(self):
        content = b"(verirrt) Tj BT 0 TL (echt drin) Tj ET"
        assert [s[3] for s in extract_page_text(content)] == ["echt drin"]

    def test_same_baseline_shows_join_one_line(self):
        pdf_content = (b"BT /F1 10 Tf 72 700 Td (links ) Tj "
                       b"(rechts) Tj 0 -14 Td (neu) Tj ET")
        shows = extract_page_text(pdf_content)
        assert len(shows) == 3
        # pdf_text_lines joins the first two (same y), breaks on Td
        import zlib
        body = zlib.compress(pdf_content)
        length_hdr = (b"4 0 obj\n<< /Length %d /Filter /FlateDecode >>"
                      b"\nstream\n" % len(body))
        pdf = (b"%PDF-1.4\n"
               b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
               b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
               b"3 0 obj\n<< /Type /Page /Parent 2 0 R "
               b"/MediaBox [0 0 612 792] /Contents 4 0 R >>\nendobj\n"
               + length_hdr + body + b"\nendstream\nendobj\n"
               b"trailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF\n")
        assert _texts(pdf) == ["links rechts", "neu"]


class TestDocStructure:
    def test_contents_array_of_streams(self):
        pdf = (b"%PDF-1.4\n"
               b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
               b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
               b"3 0 obj\n<< /Type /Page /Parent 2 0 R "
               b"/Contents [4 0 R 5 0 R] >>\nendobj\n"
               b"4 0 obj\n<< /Length 26 >>\nstream\n"
               b"BT 0 TL 72 700 Td (ab) Tj\nendstream\nendobj\n"
               b"5 0 obj\n<< /Length 22 >>\nstream\n"
               b"0 -14 Td (weiter) Tj ET\nendstream\nendobj\n"
               b"trailer\n<< /Size 6 /Root 1 0 R >>\n%%EOF\n")
        # state resets between streams per spec? NO — streams of one
        # page concatenate into ONE program (PDF 32000 §7.8.2)
        assert _texts(pdf, min_len=1) == ["ab", "weiter"]

    def test_nested_pages_tree_order(self):
        pdf = (b"%PDF-1.4\n"
               b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
               b"2 0 obj\n<< /Type /Pages /Kids [6 0 R 5 0 R] /Count 2 >>\nendobj\n"
               b"6 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
               b"3 0 obj\n<< /Type /Page /Parent 6 0 R /Contents 4 0 R >>\nendobj\n"
               b"4 0 obj\n<< /Length 31 >>\nstream\n"
               b"BT 0 TL 72 700 Td (seite1) Tj ET\nendstream\nendobj\n"
               b"5 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 7 0 R >>\nendobj\n"
               b"7 0 obj\n<< /Length 31 >>\nstream\n"
               b"BT 0 TL 72 700 Td (seite2) Tj ET\nendstream\nendobj\n"
               b"trailer\n<< /Size 8 /Root 1 0 R >>\n%%EOF\n")
        lines, n_pages = pdf_text_lines(pdf)
        assert n_pages == 2
        assert [t for (_i, t, _g) in lines] == ["seite1", "seite2"]

    def test_sniff(self):
        assert sniff_is_pdf(b"%PDF-1.7\nrest")
        assert sniff_is_pdf(b"\xef\xbb\xbf  %PDF-1.4")
        assert not sniff_is_pdf(b"<html><body>%PDF- later</body>")

    def test_malformed_raises_pdferror(self):
        with pytest.raises(PdfError):
            pdf_text_lines(b"%PDF-1.4\nnot really a pdf")
        with pytest.raises(PdfError):
            pdf_text_lines(doc_to_pdf(["ok zeile"])[:60])
        with pytest.raises(PdfError):
            pdf_text_lines(b"kein header")


class TestPipelineDispatch:
    def test_extract_document_dispatches_pdf(self):
        from ocr_pipeline_ray.functions.extract import extract_document

        pdf = doc_to_pdf(["inhalt zeile eins", "inhalt zeile zwei"])
        texts, overrides, stats = extract_document(pdf)
        assert texts == ["inhalt zeile eins", "inhalt zeile zwei"]
        assert stats["dialect"] == "pdf"
        ids, geoms = overrides
        assert ids == ["p0000_l00000", "p0000_l00001"]
        assert all(len(g) == 4 for g in geoms)

    def test_corpus_pdf_kind_extracts(self):
        import random

        from ocr_pipeline_ray.corpus import build_page
        from ocr_pipeline_ray.functions.extract import extract_document

        raw = build_page(random.Random("pdf:1"), 1, "pdf", "de")
        assert sniff_is_pdf(raw)
        texts, overrides, stats = extract_document(raw)
        assert stats["dialect"] == "pdf" and len(texts) >= 4
        assert all(len(t) >= 2 for t in texts)

    def test_pipeline_error_row_on_truncated_pdf(self, ray_session):
        import ray.data

        from ocr_pipeline_ray.pipelines.extraction import build_pipeline

        good = doc_to_pdf(["guter inhalt hier"])
        tbl = pa.table({
            "url": pa.array(["pdf://ok", "pdf://bad"], pa.string()),
            "warc_ts": pa.array([0, 0], pa.timestamp("us")),
            "html": pa.array([good, good[:64]], pa.binary()),
            "lang": pa.array(["de", "de"], pa.string()),
        })
        rows = {r["url"]: r
                for r in build_pipeline(ray.data.from_arrow(tbl)).take_all()}
        assert rows["pdf://ok"]["error"] is None
        assert rows["pdf://ok"]["extracted_text"] == "guter inhalt hier"
        assert rows["pdf://bad"]["error"] and "PdfError" in rows["pdf://bad"]["error"]
