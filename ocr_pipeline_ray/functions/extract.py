"""HTML main-content extraction (the recognition stage's semantics).

Plays the role of the reference's recognition + line-model steps
(StepTesseract at ``/root/reference/lib/ocr_step.py:132-194`` feeding
``get_lines`` at ``lib/ocr_model.py:203-245``): one opaque document in,
an ordered list of text lines out. Input here is Common-Crawl-style
HTML bytes; main content is separated from boilerplate with
text-density / link-density heuristics (Boilerpipe-family, public
technique), built from scratch on the stdlib ``html.parser``.

Semantics (deterministic, the parity contract):

* Lines are produced in DOM order (reading order). A line is the text
  accumulated inside one block-level element, split further at
  ``<br>``.
* Content inside ``script/style/noscript/template/head/title/svg/
  option/button`` is ignored outright.
* A line is boilerplate — dropped — if any open ancestor is a
  ``nav/footer/aside/header/form`` element, or an element whose
  ``class``/``id`` matches the boilerplate pattern, or if the line's
  link density (characters inside ``<a>`` / all characters) exceeds
  ``max_link_density``.
* Tokens have Unicode direction / zero-width marks stripped
  (``lib/ocr_model.py:23-29,153-157``); a line inside a ``dir="rtl"``
  element has its token order reversed, mirroring the reference's
  reorder quirk (``lib/ocr_model.py:60-69``).
* Lines shorter than ``min_len`` characters are dropped, mirroring the
  ALTO min-length filter (``lib/ocr_model.py:217-223``).
* Geometry is synthesized deterministically (fixed line grid) so the
  line schema carries the reference's HPOS/VPOS/WIDTH/HEIGHT shape
  (``lib/ocr_model.py:93-98``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from html.parser import HTMLParser
from typing import Dict, List, Optional, Tuple

from .text import CLEAR_MARKS, strip_marks

# one C-level scan instead of len(CLEAR_MARKS) substring probes per line
_MARKS_RE = re.compile("[" + "".join(CLEAR_MARKS) + "]")

_BLOCK_TAGS = frozenset(
    {
        "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
        "table", "tr", "td", "th", "blockquote", "pre", "article",
        "section", "main", "aside", "nav", "header", "footer", "form",
        "figure", "figcaption", "dl", "dt", "dd", "hr", "body",
    }
)
_IGNORED_TAGS = frozenset(
    {"script", "style", "noscript", "template", "head", "title", "svg",
     "option", "button"}
)
_BOILER_TAGS = frozenset({"nav", "footer", "aside", "header", "form"})
_VOID_TAGS = frozenset(
    {"br", "img", "hr", "meta", "link", "input", "area", "base", "col",
     "embed", "source", "track", "wbr"}
)

DEFAULT_BOILER_CLASS_RE = r"(?:^|[\s_-])(?:ad|ads|advert\w*|banner|menu|nav|navbar|footer|header|sidebar|comment\w*|social|share|cookie|promo)(?:$|[\s_-])"


@dataclass(frozen=True)
class ExtractConfig:
    """Tunable, deterministic extraction thresholds."""

    min_len: int = 2
    max_link_density: float = 0.49
    boiler_class_pattern: str = DEFAULT_BOILER_CLASS_RE
    # synthesized layout grid (int32 geometry parity with ALTO shape)
    hpos0: int = 80
    vpos0: int = 100
    line_height: int = 24
    line_step: int = 28
    char_width: int = 12


# stack frames are plain tuples (tag, ignored, boiler, rtl) — a
# dataclass per open element was a measurable share of per-doc cost
_ROOT_STATE = (False, False, False)


class _MainContentParser(HTMLParser):
    """Single-pass streaming extractor; one instance per document."""

    def __init__(self, config: ExtractConfig, boiler_re: re.Pattern):
        super().__init__(convert_charrefs=True)
        self.cfg = config
        self.boiler_re = boiler_re
        self.stack: List[Tuple[str, bool, bool, bool]] = []
        self.link_depth = 0
        # current line accumulation; char counting is deferred to
        # flush (counts are additive across segment boundaries, so
        # splitting once per line == splitting per segment)
        self._segments: List[str] = []
        self._link_segments: List[str] = []
        self._line_boiler = False
        self._line_rtl = False
        self._line_open = False
        self.raw_lines: List[Tuple[str, bool, int, int]] = []
        self.n_boiler_dropped = 0
        self.n_link_dropped = 0
        self.n_short_dropped = 0

    # -- frame helpers -------------------------------------------------
    def _state(self) -> Tuple[bool, bool, bool]:
        stack = self.stack
        if not stack:
            return _ROOT_STATE
        return stack[-1][1:]

    # -- line accumulation ---------------------------------------------
    def _flush_line(self) -> None:
        if not self._line_open:
            return
        text = "".join(self._segments)
        tokens = text.split()
        # raw (pre-mark-strip) char counts feed link density — same
        # values as per-segment counting, computed once per line
        total_chars = sum(map(len, tokens))
        if self._link_segments:
            link_chars = sum(
                sum(map(len, seg.split())) for seg in self._link_segments
            )
        else:
            link_chars = 0
        # mark stripping only when a mark is present in the line at
        # all (rare) — avoids a per-token function call on the hot path
        if tokens and _MARKS_RE.search(text) is not None:
            tokens = [strip_marks(t) for t in tokens]
            tokens = [t for t in tokens if t]
        self._line_open = False
        self._segments = []
        self._link_segments = []
        if tokens:
            if self._line_rtl:
                tokens = list(reversed(tokens))
            line_text = " ".join(tokens)
            self.raw_lines.append(
                (line_text, self._line_boiler, link_chars, total_chars)
            )
        self._line_boiler = False
        self._line_rtl = False

    # -- HTMLParser hooks ----------------------------------------------
    # tag names arrive lowercase from BOTH drivers (the stdlib
    # HTMLParser contract lowercases them; _fast_feed lowers
    # explicitly), so the handlers do not re-lower
    def handle_starttag(self, tag, attrs):
        if tag == "br":
            if self._line_open:
                self._flush_line()
            return
        if tag in _VOID_TAGS:
            return
        if tag == "a":
            self.link_depth += 1
            return
        stack = self.stack
        if stack:
            _t, ignored, boiler, rtl = stack[-1]
        else:
            ignored = boiler = rtl = False
        ignored = ignored or tag in _IGNORED_TAGS
        boiler = boiler or tag in _BOILER_TAGS
        if attrs:
            for name, value in attrs:
                if value is None:
                    continue
                lname = name.lower()
                if lname in ("class", "id"):
                    if self.boiler_re.search(value.lower()):
                        boiler = True
                elif lname == "dir":
                    rtl = value.strip().lower() == "rtl"
        if tag in _BLOCK_TAGS and self._line_open:
            self._flush_line()
        stack.append((tag, ignored, boiler, rtl))

    def handle_endtag(self, tag):
        if tag == "a":
            if self.link_depth > 0:
                self.link_depth -= 1
            return
        if tag in _VOID_TAGS:
            return
        if tag in _BLOCK_TAGS and self._line_open:
            self._flush_line()
        stack = self.stack
        # fast path: properly nested close
        if stack and stack[-1][0] == tag:
            stack.pop()
            return
        # pop to the matching open frame (tolerates misnesting)
        for i in range(len(stack) - 1, -1, -1):
            if stack[i][0] == tag:
                del stack[i:]
                break

    def handle_startendtag(self, tag, attrs):
        if tag == "br":
            self._flush_line()

    def handle_data(self, data):
        stack = self.stack
        if stack:
            _t, ignored, boiler, rtl = stack[-1]
        else:
            ignored = boiler = rtl = False
        if ignored or not data:
            return
        if not self._line_open and not data.strip():
            return
        self._line_open = True
        self._segments.append(data)
        if self.link_depth > 0:
            self._link_segments.append(data)
        if boiler:
            self._line_boiler = True
        if rtl:
            self._line_rtl = True


# --- fast tokenizer ---------------------------------------------------
# Drives the same _MainContentParser handlers as html.parser but with a
# single regex scan (HTMLParser's goahead/parse_starttag machinery is
# ~60-70% of per-doc cost). Validated drift-free against the stdlib
# path on VALID HTML (incl. quoted '>', comments, rawtext, misnesting
# — see TestFastTokenizerDrift). On INVALID markup — a raw unescaped
# '<' in text content — recovery is undefined and the two parsers may
# segment differently. NOTE: since the split-walk scanner landed,
# _scan_extract (below) is the PRODUCTION path and the engine's
# authoritative behavior; _fast_feed remains as the drift-test
# reference implementation, and the stdlib parser is the fallback
# when the scanner raises.

# element bodies consume quoted attribute values atomically so a '>'
# inside quotes (href="x>y") does not terminate the tag early —
# matching html.parser's behavior. The body is matched with GREEDY
# unquoted-chunk / quoted-string alternation (linear scan, no
# per-character lazy backtracking — the lazy variant was the single
# hottest regex in the engine); a trailing '/' lands inside the body
# and is ignored by the name/attr parses.
_TAG_RE = re.compile(
    r"<(!--.*?--|!\[CDATA\[.*?\]\]|![^>]*"
    r"|/?[a-zA-Z][^>\"']*(?:(?:\"[^\"]*\"|'[^']*')[^>\"']*)*)>",
    re.S,
)
_NAME_RE = re.compile(r"[a-zA-Z][a-zA-Z0-9-]*")
_ATTR_RE = re.compile(
    r"""([a-zA-Z_:][-a-zA-Z0-9_:.]*)\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]*))"""
)
_RAWTEXT_TAGS = frozenset({"script", "style", "textarea", "title"})


def _fast_feed(text: str, parser: "_MainContentParser") -> None:
    from html import unescape

    # hot-loop locals: attribute lookups out of the per-tag path
    tag_search = _TAG_RE.search
    name_match_fn = _NAME_RE.match
    handle_data = parser.handle_data
    handle_starttag = parser.handle_starttag
    handle_endtag = parser.handle_endtag
    pos = 0
    n = len(text)
    lower: Optional[str] = None
    while True:
        match = tag_search(text, pos)
        if not match:
            break
        start = match.start()
        if start > pos:
            seg = text[pos:start]
            if "&" in seg:
                seg = unescape(seg)
            handle_data(seg)
        body = match.group(1)
        pos = match.end()
        first = body[0]
        if first == "!":
            continue  # comment / doctype / CDATA
        if first == "/":
            handle_endtag(body[1:].strip().lower())
            continue
        name_match = name_match_fn(body)
        if not name_match:
            continue
        name = name_match.group(0).lower()
        attrs = []
        rest = body[name_match.end():]
        if rest:
            rest_l = rest.lower()
            if "class" in rest_l or "id" in rest_l or "dir" in rest_l:
                for am in _ATTR_RE.finditer(rest):
                    val = am.group(2)
                    if val is None:
                        val = (am.group(3) if am.group(3) is not None
                               else am.group(4))
                    attrs.append((am.group(1), val))
        handle_starttag(name, attrs)
        if name in _RAWTEXT_TAGS:
            if lower is None:
                lower = text.lower()
            close = lower.find("</" + name, pos)
            if close == -1:
                pos = n
            else:
                gt = text.find(">", close)
                handle_endtag(name)
                pos = n if gt == -1 else gt + 1
    if pos < n:
        seg = text[pos:]
        if "&" in seg:
            seg = unescape(seg)
        handle_data(seg)


# --- split-walk scanner ----------------------------------------------
# The production hot path: ONE re.split pass turns the document into a
# flat [text, bang, slash, name, rest, text, ...] list (5-stride), so
# the per-tag cost is list indexing instead of a match object + group/
# start/end calls per tag — measured ~20% faster end-to-end than the
# search-loop tokenizer (_fast_feed) on the bench corpus. Handler
# logic is inlined with local state; semantics are pinned equal to
# _fast_feed + _MainContentParser by TestScanExtractDrift (NASTY
# fixtures + corpus). Rawtext (<script>/<style>/...) is handled in
# SKIP mode: items are discarded until the matching end tag, which
# matches the jump semantics of _fast_feed on every pinned case (the
# two can differ only on pathological invalid markup — a quoted
# "</script" inside a spurious tag inside a script body — where
# recovery is undefined and the engine is authoritative).
_TAG_SPLIT_RE = re.compile(
    r"<(?:(!--.*?--|!\[CDATA\[.*?\]\]|![^>]*)"
    r"|(/?)([a-zA-Z][a-zA-Z0-9-]*)"
    r"([^>\"']*(?:(?:\"[^\"]*\"|'[^']*')[^>\"']*)*))>",
    re.S,
)
# allocation-free attr gate (replaces rest.lower() + three `in` scans)
_ATTR_GATE_RE = re.compile(r"class|id|dir", re.I)


def _scan_extract(
    text: str, boiler_re: re.Pattern
) -> List[Tuple[str, bool, int, int]]:
    """Fused single-pass extractor: returns ``raw_lines`` equal to
    ``_fast_feed`` + ``_MainContentParser`` (same tuples, same order).
    """
    from html import unescape

    attr_finditer = _ATTR_RE.finditer
    boiler_search = boiler_re.search
    marks_search = _MARKS_RE.search
    gate_search = _ATTR_GATE_RE.search
    block_tags = _BLOCK_TAGS
    ignored_tags = _IGNORED_TAGS
    boiler_tags = _BOILER_TAGS
    void_tags = _VOID_TAGS
    rawtext_tags = _RAWTEXT_TAGS

    stack: List[Tuple[str, bool, bool, bool]] = []
    cur_ignored = cur_boiler = cur_rtl = False
    link_depth = 0
    segments: List[str] = []
    link_segments: List[str] = []
    line_boiler = line_rtl = line_open = False
    raw_lines: List[Tuple[str, bool, int, int]] = []
    skip_until: Optional[str] = None   # rawtext skip mode

    def flush() -> None:
        nonlocal line_open, line_boiler, line_rtl, segments, link_segments
        line_text = "".join(segments)
        tokens = line_text.split()
        total_chars = sum(map(len, tokens))
        if link_segments:
            link_chars = sum(
                sum(map(len, seg.split())) for seg in link_segments)
            link_segments = []
        else:
            link_chars = 0
        if tokens and doc_may_have_marks \
                and marks_search(line_text) is not None:
            tokens = [strip_marks(t) for t in tokens]
            tokens = [t for t in tokens if t]
        line_open = False
        segments = []
        if tokens:
            if line_rtl:
                tokens = tokens[::-1]
            raw_lines.append(
                (" ".join(tokens), line_boiler, link_chars, total_chars))
        line_boiler = False
        line_rtl = False

    # mark stripping can only fire if the doc contains a mark char
    # already, or an entity that could decode to one — checked ONCE
    # per document so the common (clean) doc skips the per-line scan
    doc_may_have_marks = "&" in text or marks_search(text) is not None

    items = _TAG_SPLIT_RE.split(text)
    it = iter(items)
    seg = next(it)
    if seg and not cur_ignored:
        if "&" in seg:
            seg = unescape(seg)
        if seg and not seg.isspace():
            line_open = True
            segments.append(seg)
    # zip over one shared iterator yields consecutive 5-tuples
    # (bang, slash, name, rest, following-text) at C speed — no
    # index arithmetic per tag
    for bang, slash, name, rest, seg in zip(it, it, it, it, it):
        if bang is None:                   # a real tag, not a comment
            if not name.islower():
                name = name.lower()
            if slash:
                # -- end tag (inlined handle_endtag) -------------------
                if skip_until is not None and name == skip_until:
                    skip_until = None
                if skip_until is None and name != "a" \
                        and name not in void_tags:
                    if line_open and name in block_tags:
                        flush()
                    if stack:
                        if stack[-1][0] == name:
                            stack.pop()
                            matched = True
                        else:
                            matched = False
                            for k in range(len(stack) - 1, -1, -1):
                                if stack[k][0] == name:
                                    del stack[k:]
                                    matched = True
                                    break
                        if matched:
                            if stack:
                                (_t, cur_ignored, cur_boiler,
                                 cur_rtl) = stack[-1]
                            else:
                                cur_ignored = cur_boiler = \
                                    cur_rtl = False
                elif skip_until is None and name == "a":
                    if link_depth:
                        link_depth -= 1
            elif skip_until is None:
                # -- start tag (inlined handle_starttag) ---------------
                if name == "br":
                    if line_open:
                        flush()
                elif name == "a":
                    link_depth += 1
                elif name not in void_tags:
                    ignored = cur_ignored or name in ignored_tags
                    boiler = cur_boiler or name in boiler_tags
                    rtl = cur_rtl
                    if rest and gate_search(rest) is not None:
                        for am in attr_finditer(rest):
                            val = am.group(2)
                            if val is None:
                                val = (am.group(3)
                                       if am.group(3) is not None
                                       else am.group(4))
                            if val is None:
                                continue
                            lname = am.group(1).lower()
                            if lname in ("class", "id"):
                                if boiler_search(val.lower()):
                                    boiler = True
                            elif lname == "dir":
                                rtl = val.strip().lower() == "rtl"
                    if line_open and name in block_tags:
                        flush()
                    stack.append((name, ignored, boiler, rtl))
                    cur_ignored, cur_boiler, cur_rtl = \
                        ignored, boiler, rtl
                    if name in rawtext_tags:
                        skip_until = name
        # -- trailing text segment (inlined handle_data) ---------------
        if seg and skip_until is None and not cur_ignored:
            if "&" in seg:
                seg = unescape(seg)
            if line_open or (seg and not seg.isspace()):
                line_open = True
                segments.append(seg)
                if link_depth:
                    link_segments.append(seg)
                if cur_boiler:
                    line_boiler = True
                if cur_rtl:
                    line_rtl = True
    if line_open:
        flush()
    return raw_lines


def extract_text_lines(
    html_bytes: bytes, config: ExtractConfig = ExtractConfig(),
    boiler_re: Optional[re.Pattern] = None,
) -> Tuple[List[str], Dict[str, int]]:
    """HTML bytes → ordered main-content line TEXTS + extraction stats.

    The allocation-light core: geometry/span metadata is a pure
    function of (line index, text length, config) and is synthesized
    by the caller (see :func:`line_geometry` / the fused stage), so
    the hot path builds no per-line dicts.
    Raises ``UnicodeDecodeError`` on non-UTF-8 input.
    """
    cfg = config
    if boiler_re is None:
        boiler_re = re.compile(cfg.boiler_class_pattern)
    text = html_bytes.decode("utf-8")
    try:
        raw_lines = _scan_extract(text, boiler_re)
    except Exception:
        # stdlib parser fallback: slower, maximally tolerant
        parser = _MainContentParser(cfg, boiler_re)
        parser.feed(text)
        parser.close()
        parser._flush_line()
        raw_lines = parser.raw_lines

    texts: List[str] = []
    n_boiler_dropped = n_link_dropped = n_short_dropped = 0
    for line_text, boiler, link_chars, total_chars in raw_lines:
        if boiler:
            n_boiler_dropped += 1
            continue
        density = link_chars / total_chars if total_chars else 0.0
        if density > cfg.max_link_density:
            n_link_dropped += 1
            continue
        if len(line_text) < cfg.min_len:
            n_short_dropped += 1
            continue
        texts.append(line_text)
    stats = {
        "n_raw_lines": len(raw_lines),
        "n_boiler_dropped": n_boiler_dropped,
        "n_link_dropped": n_link_dropped,
        "n_short_dropped": n_short_dropped,
        "n_lines": len(texts),
    }
    return texts, stats


def extract_document(
    html_bytes: bytes, config: ExtractConfig = ExtractConfig(),
    boiler_re: Optional[re.Pattern] = None,
):
    """Format-dispatching extractor core (the S3 sniff, SURVEY §2.1).

    Returns ``(texts, overrides, stats)`` where ``overrides`` is
    ``None`` for HTML (geometry synthesized downstream) or
    ``(ids, geoms)`` for ALTO/PAGE/PDF documents carrying REAL
    element ids and layout coordinates. Raises on malformed
    XML / PDF / PAGE words-without-line-text (error-row semantics)
    and on non-UTF-8 HTML.
    """
    from .pdf import pdf_text_lines, sniff_is_pdf
    from .xmlmodel import get_xml_lines, sniff_is_xml

    if sniff_is_pdf(html_bytes):
        pdf_lines, _n_pages = pdf_text_lines(
            html_bytes, min_len=config.min_len)
        texts = [t for (_i, t, _g) in pdf_lines]
        ids = [i for (i, _t, _g) in pdf_lines]
        geoms = [g for (_i, _t, g) in pdf_lines]
        stats = {
            "n_raw_lines": len(pdf_lines),
            "n_boiler_dropped": 0,
            "n_link_dropped": 0,
            "n_short_dropped": 0,
            "n_lines": len(pdf_lines),
            "dialect": "pdf",
        }
        return texts, (ids, geoms), stats
    if sniff_is_xml(html_bytes):
        lines, dialect = get_xml_lines(html_bytes, min_len=config.min_len)
        texts = [t for (_i, t, _g) in lines]
        ids = [i for (i, _t, _g) in lines]
        geoms = [g for (_i, _t, g) in lines]
        stats = {
            "n_raw_lines": len(lines),
            "n_boiler_dropped": 0,
            "n_link_dropped": 0,
            "n_short_dropped": 0,
            "n_lines": len(lines),
            "dialect": dialect,
        }
        return texts, (ids, geoms), stats
    texts, stats = extract_text_lines(html_bytes, config, boiler_re)
    stats["dialect"] = "html"
    return texts, None, stats


def line_geometry(index: int, text: str, cfg: ExtractConfig) -> Dict[str, int]:
    """Deterministic synthesized layout for line ``index`` (int32 grid)."""
    return {
        "hpos": cfg.hpos0,
        "vpos": cfg.vpos0 + cfg.line_step * index,
        "width": cfg.char_width * len(text),
        "height": cfg.line_height,
    }


def extract_lines(
    html_bytes: bytes, config: ExtractConfig = ExtractConfig(),
    boiler_re: Optional[re.Pattern] = None,
) -> Tuple[List[Dict[str, object]], Dict[str, int]]:
    """HTML bytes → ordered main-content lines + extraction stats.

    Returns ``(lines, stats)`` where each line is a dict matching
    ``schema.LINE_TYPE`` minus the span offsets (filled in after
    normalization). Raises ``UnicodeDecodeError`` on non-UTF-8 input
    (caller maps this to the error column / skip-row semantics).
    """
    cfg = config
    texts, overrides, stats = extract_document(html_bytes, cfg, boiler_re)
    lines: List[Dict[str, object]] = []
    for out_index, line_text in enumerate(texts):
        line = {
            "line_id": f"l{out_index:05d}",
            "text": line_text,
            "start": -1,
            "stop": -1,
        }
        if overrides is not None:
            ids, geoms = overrides
            line["line_id"] = ids[out_index]
            hpos, vpos, width, height = geoms[out_index]
            line.update(
                {"hpos": hpos, "vpos": vpos, "width": width, "height": height}
            )
        else:
            line.update(line_geometry(out_index, line_text, cfg))
        lines.append(line)
    return lines, stats
