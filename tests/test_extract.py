"""Golden tests for the HTML main-content extractor."""

from ocr_pipeline_ray.functions.extract import ExtractConfig, extract_lines


def _texts(html: str, **cfg):
    config = ExtractConfig(**cfg) if cfg else ExtractConfig()
    lines, stats = extract_lines(html.encode("utf-8"), config)
    return [ln["text"] for ln in lines], stats


class TestBoilerplate:
    def test_nav_footer_dropped(self):
        html = (
            "<html><body><nav><ul><li><a href='/a'>Startseite</a></li>"
            "<li><a href='/b'>Impressum</a></li></ul></nav>"
            "<p>Der echte Inhalt steht hier</p>"
            "<footer><p>Kontakt Datenschutz</p></footer></body></html>"
        )
        texts, stats = _texts(html)
        assert texts == ["Der echte Inhalt steht hier"]
        assert stats["n_boiler_dropped"] == 3

    def test_boiler_class_dropped(self):
        html = (
            "<body><div class='sidebar'><p>Werbung kaufen</p></div>"
            "<div class='content'><p>Haupttext bleibt</p></div></body>"
        )
        texts, _ = _texts(html)
        assert texts == ["Haupttext bleibt"]

    def test_link_farm_density_dropped(self):
        html = (
            "<body><div><a href='/1'>viele worte hier</a> "
            "<a href='/2'>noch mehr links</a> und</div>"
            "<p>Normaler Absatz mit genug eigenem Text dabei</p></body>"
        )
        texts, stats = _texts(html)
        assert texts == ["Normaler Absatz mit genug eigenem Text dabei"]
        assert stats["n_link_dropped"] == 1

    def test_script_style_ignored(self):
        html = (
            "<body><script>var x=1;</script><style>.a{}</style>"
            "<p>Nur dieser Text</p></body>"
        )
        texts, _ = _texts(html)
        assert texts == ["Nur dieser Text"]


class TestLineModel:
    def test_br_splits_lines(self):
        texts, _ = _texts("<body><p>erste zeile<br/>zweite zeile</p></body>")
        assert texts == ["erste zeile", "zweite zeile"]

    def test_inline_tags_do_not_break_tokens(self):
        texts, _ = _texts("<body><p><b>Wor</b>t zusammen</p></body>")
        assert texts == ["Wort zusammen"]

    def test_min_len_filter(self):
        texts, stats = _texts("<body><p>a</p><p>ok gut</p></body>")
        assert texts == ["ok gut"]
        assert stats["n_short_dropped"] == 1

    def test_rtl_reverses_tokens(self):
        texts, _ = _texts('<body><p dir="rtl">eins zwei drei</p></body>')
        assert texts == ["drei zwei eins"]

    def test_marks_stripped(self):
        texts, _ = _texts("<body><p>wort‏ hier﻿ da</p></body>")
        assert texts == ["wort hier da"]

    def test_entities_decoded(self):
        texts, _ = _texts("<body><p>s&lt; und &amp; zeichen</p></body>")
        assert texts == ["s< und & zeichen"]

    def test_geometry_deterministic(self):
        lines, _ = extract_lines(
            b"<body><p>erste zeile gut</p><p>zweite zeile gut</p></body>"
        )
        cfg = ExtractConfig()
        assert lines[0]["vpos"] == cfg.vpos0
        assert lines[1]["vpos"] == cfg.vpos0 + cfg.line_step
        assert lines[0]["width"] == cfg.char_width * len(lines[0]["text"])
        assert [ln["line_id"] for ln in lines] == ["l00000", "l00001"]


class TestDegenerate:
    def test_empty_page(self):
        texts, stats = _texts("<html><body><main><div>  </div></main></body></html>")
        assert texts == [] and stats["n_lines"] == 0

    def test_whitespace_only_paragraphs(self):
        texts, _ = _texts("<body><p>   </p><p></p><p>echter text</p></body>")
        assert texts == ["echter text"]

    def test_malformed_still_parses(self):
        texts, _ = _texts("<body><div><p>Unclosed anfang <p>noch ein text</body>")
        assert "Unclosed anfang" in texts[0]

    def test_invalid_utf8_raises(self):
        import pytest

        with pytest.raises(UnicodeDecodeError):
            extract_lines(b"<p>kaputt \xff\xfe</p>")

    def test_deterministic(self):
        html = b"<body><p>stabile ausgabe immer gleich</p></body>"
        assert extract_lines(html) == extract_lines(html)
