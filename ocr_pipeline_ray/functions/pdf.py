"""Pure-stdlib PDF text-layer writer + parser (the "PDF/layout parse"
leg of the extraction engine).

The reference pipeline hands every non-HTML document to a stateful
recognition/parsing step (`ocr_step.py:132-194` builds the per-file
tool invocation; `ocr_step.py:188-194` treats the input as an opaque
binary whose text layer the step must recover). This module is that
step's PDF analogue, built from scratch on the public PDF 1.4 spec:

* :func:`doc_to_pdf` — a real PDF writer: page tree, font resource,
  per-page FlateDecode content streams, a correct xref table and
  trailer. Used by the corpus/roundtrip fixtures, exactly like the
  ALTO emitter (`functions/xmlout.py`) is used by the ALTO roundtrip.
* :func:`pdf_text_lines` — a real PDF parser: indirect-object scan,
  trailer → /Root → /Pages tree walk (nested /Kids, /Contents ref or
  array), stream decoding (/FlateDecode via zlib), and a content
  stream interpreter covering the text operators BT/ET, Tf, TL, Td,
  TD, Tm, T*, Tj, ', ", TJ with full PDF string syntax (nested
  parens, escape sequences, octal escapes, line continuations, hex
  strings). Lines are assembled from the text matrix: a show op at a
  new baseline y starts a new line; same-baseline shows concatenate.

No third-party dependency: only ``re`` + ``zlib``. Binary payloads
(images, embedded fonts) pass through untouched as streams we never
decode — text extraction only reads page content streams.
"""

from __future__ import annotations

import re
import zlib
from typing import Dict, List, Optional, Tuple

Geom = Tuple[int, int, int, int]  # (hpos, vpos, width, height)

PDF_MAGIC = b"%PDF-"


def sniff_is_pdf(raw: bytes) -> bool:
    """Cheap dispatch: the spec requires ``%PDF-`` at the start of
    the header; we tolerate leading whitespace / UTF-8 BOM junk
    (lenient real-world readers do the same) but nothing else —
    ``%PDF-`` later in an HTML page must NOT divert dispatch."""
    head = raw[:32].lstrip(b"\xef\xbb\xbf" + _WS)
    return head.startswith(PDF_MAGIC)


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------

_ESC = {ord("("): b"\\(", ord(")"): b"\\)", ord("\\"): b"\\\\",
        ord("\n"): b"\\n", ord("\r"): b"\\r", ord("\t"): b"\\t"}


def _pdf_string(text: str) -> bytes:
    """Literal PDF string. Non-latin-1 code points are written as a
    UTF-16BE hex string (with BOM) instead — both forms round-trip
    through :func:`_decode_pdf_string`."""
    try:
        raw = text.encode("latin-1")
    except UnicodeEncodeError:
        return b"<FEFF" + text.encode("utf-16-be").hex().upper().encode() + b">"
    out = bytearray(b"(")
    for b in raw:
        out += _ESC.get(b, bytes((b,)))
    out += b")"
    return bytes(out)


def doc_to_pdf(
    lines: List[str],
    lines_per_page: int = 40,
    font_size: int = 12,
    leading: int = 14,
    page_w: int = 612,
    page_h: int = 792,
    compress: bool = True,
) -> bytes:
    """Serialize text lines to a complete, valid PDF (one font, one
    content stream per page, FlateDecode, correct xref offsets)."""
    pages = [lines[i:i + lines_per_page]
             for i in range(0, len(lines), lines_per_page)] or [[]]
    n_pages = len(pages)
    # object numbering: 1 catalog, 2 pages, 3 font,
    # then per page i: 4+2i page, 5+2i content
    objs: Dict[int, bytes] = {}
    kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(n_pages))
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = (f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>"
               ).encode()
    objs[3] = (b"<< /Type /Font /Subtype /Type1 "
               b"/BaseFont /Helvetica >>")
    for i, page_lines in enumerate(pages):
        body = bytearray(b"BT\n/F1 %d Tf\n%d TL\n72 %d Td\n"
                         % (font_size, leading, page_h - 72))
        for j, text in enumerate(page_lines):
            if j:
                body += b"T*\n"
            body += _pdf_string(text) + b" Tj\n"
        body += b"ET"
        data = bytes(body)
        if compress:
            data = zlib.compress(data)
            filt = b"/Filter /FlateDecode "
        else:
            filt = b""
        objs[4 + 2 * i] = (
            b"<< /Type /Page /Parent 2 0 R /Resources "
            b"<< /Font << /F1 3 0 R >> >> /MediaBox [0 0 %d %d] "
            b"/Contents %d 0 R >>" % (page_w, page_h, 5 + 2 * i)
        )
        objs[5 + 2 * i] = (
            b"<< /Length %d %s>>\nstream\n" % (len(data), filt)
            + data + b"\nendstream"
        )
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: Dict[int, int] = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    n_objs = max(objs) + 1
    out += b"xref\n0 %d\n0000000000 65535 f \n" % n_objs
    for num in range(1, n_objs):
        out += b"%010d 00000 n \n" % offsets[num]
    out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (n_objs, xref_at))
    return bytes(out)


# ---------------------------------------------------------------------------
# object-level parser
# ---------------------------------------------------------------------------

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"
_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_TRAILER_RE = re.compile(rb"trailer\b")
_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_NAME_ESC_RE = re.compile(rb"#([0-9A-Fa-f]{2})")


class PdfError(ValueError):
    """Malformed PDF → the pipeline's error-row semantics."""


class _Lexer:
    """Tokenizer over one object body / dictionary region."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def _skip_ws(self) -> None:
        d, n = self.data, len(self.data)
        p = self.pos
        while p < n:
            c = d[p:p + 1]
            if c in b"%":
                while p < n and d[p] not in b"\r\n":
                    p += 1
            elif c in _WS:
                p += 1
            else:
                break
        self.pos = p

    def parse_value(self):
        """One PDF object value: dict, array, name, number, ref,
        string, hex string, bool, null."""
        self._skip_ws()
        d = self.data
        p = self.pos
        if p >= len(d):
            raise PdfError("unexpected end of data")
        c = d[p:p + 1]
        if d[p:p + 2] == b"<<":
            return self._parse_dict()
        if c == b"<":
            return self._parse_hex_string()
        if c == b"(":
            return self._parse_literal_string()
        if c == b"[":
            return self._parse_array()
        if c == b"/":
            return self._parse_name()
        if d[p:p + 4] == b"true":
            self.pos = p + 4
            return True
        if d[p:p + 5] == b"false":
            self.pos = p + 5
            return False
        if d[p:p + 4] == b"null":
            self.pos = p + 4
            return None
        m = _NUM_RE.match(d, p)
        if m:
            # try indirect reference:  N G R
            ref = self._try_ref(m)
            if ref is not None:
                return ref
            self.pos = m.end()
            tok = m.group()
            return float(tok) if b"." in tok else int(tok)
        raise PdfError(f"unexpected token at byte {p}")

    def _try_ref(self, m) -> Optional["Ref"]:
        d = self.data
        tail = _NUM_RE.match(d, self._ws_end(m.end()))
        if not tail or b"." in m.group() or b"." in tail.group():
            return None
        p2 = self._ws_end(tail.end())
        if d[p2:p2 + 1] == b"R" and (
            p2 + 1 >= len(d) or d[p2 + 1] in _WS or d[p2 + 1] in _DELIM
        ):
            self.pos = p2 + 1
            return Ref(int(m.group()))
        return None

    def _ws_end(self, p: int) -> int:
        d = self.data
        while p < len(d) and d[p] in _WS:
            p += 1
        return p

    def _parse_name(self) -> str:
        d = self.data
        p = self.pos + 1
        start = p
        while p < len(d) and d[p] not in _WS and d[p] not in _DELIM:
            p += 1
        self.pos = p
        raw = _NAME_ESC_RE.sub(
            lambda m: bytes((int(m.group(1), 16),)), d[start:p])
        return "/" + raw.decode("latin-1")

    def _parse_dict(self) -> Dict[str, object]:
        self.pos += 2
        out: Dict[str, object] = {}
        while True:
            self._skip_ws()
            if self.data[self.pos:self.pos + 2] == b">>":
                self.pos += 2
                return out
            key = self.parse_value()
            if not isinstance(key, str) or not key.startswith("/"):
                raise PdfError("dict key is not a name")
            out[key] = self.parse_value()

    def _parse_array(self) -> List[object]:
        self.pos += 1
        out: List[object] = []
        while True:
            self._skip_ws()
            if self.data[self.pos:self.pos + 1] == b"]":
                self.pos += 1
                return out
            out.append(self.parse_value())

    def _parse_hex_string(self) -> bytes:
        end = self.data.find(b">", self.pos + 1)
        if end < 0:
            raise PdfError("unterminated hex string")
        hexdigits = re.sub(rb"[^0-9A-Fa-f]", b"", self.data[self.pos + 1:end])
        if len(hexdigits) % 2:
            hexdigits += b"0"
        self.pos = end + 1
        return bytes.fromhex(hexdigits.decode("ascii"))

    def _parse_literal_string(self) -> bytes:
        d = self.data
        p = self.pos + 1
        depth = 1
        out = bytearray()
        n = len(d)
        while p < n:
            c = d[p]
            if c == 0x5C:  # backslash
                p += 1
                if p >= n:
                    break
                e = d[p]
                if e in b"nrtbf":
                    out += {0x6E: b"\n", 0x72: b"\r", 0x74: b"\t",
                            0x62: b"\b", 0x66: b"\f"}[e]
                    p += 1
                elif e in b"()\\":
                    out.append(e)
                    p += 1
                elif 0x30 <= e <= 0x37:  # octal, 1-3 digits
                    oct_digits = bytearray([e])
                    p += 1
                    while p < n and len(oct_digits) < 3 and 0x30 <= d[p] <= 0x37:
                        oct_digits.append(d[p])
                        p += 1
                    out.append(int(oct_digits.decode(), 8) & 0xFF)
                elif e in b"\r\n":  # line continuation
                    p += 1
                    if e == 0x0D and p < n and d[p] == 0x0A:
                        p += 1
                else:
                    out.append(e)
                    p += 1
            elif c == 0x28:  # (
                depth += 1
                out.append(c)
                p += 1
            elif c == 0x29:  # )
                depth -= 1
                if depth == 0:
                    self.pos = p + 1
                    return bytes(out)
                out.append(c)
                p += 1
            else:
                out.append(c)
                p += 1
        raise PdfError("unterminated literal string")


class Ref:
    __slots__ = ("num",)

    def __init__(self, num: int):
        self.num = num

    def __repr__(self):  # pragma: no cover - debug aid
        return f"Ref({self.num})"


def _decode_pdf_string(raw: bytes) -> str:
    """PDF text-string decoding: UTF-16BE with BOM, else PDFDoc
    (approximated as latin-1 — exact for the printable ASCII the
    corpus uses, and byte-preserving for everything else)."""
    if raw[:2] == b"\xfe\xff":
        return raw[2:].decode("utf-16-be", errors="replace")
    return raw.decode("latin-1")


class _PdfDoc:
    """Indirect-object map + trailer, built by a linear scan (robust
    to a wrong/absent xref, like lenient real-world readers)."""

    def __init__(self, data: bytes):
        if not sniff_is_pdf(data):
            raise PdfError("missing %PDF- header")
        self.data = data
        self.objs: Dict[int, Tuple[object, Optional[bytes]]] = {}
        for m in _OBJ_RE.finditer(data):
            num = int(m.group(1))
            lex = _Lexer(data, m.end())
            try:
                val = lex.parse_value()
            except PdfError:
                continue
            stream: Optional[bytes] = None
            p = lex._ws_end(lex.pos)
            if data[p:p + 6] == b"stream":
                p += 6
                if data[p:p + 2] == b"\r\n":
                    p += 2
                elif data[p:p + 1] in (b"\n", b"\r"):
                    p += 1
                length = val.get("/Length") if isinstance(val, dict) else None
                if isinstance(length, Ref):
                    length = None  # resolve later; fall back to scan
                if isinstance(length, int) and \
                        data[p + length:p + length + 20].lstrip()[:9] == b"endstream":
                    stream = data[p:p + length]
                else:
                    end = data.find(b"endstream", p)
                    if end < 0:
                        raise PdfError("unterminated stream")
                    stream = data[p:end].rstrip(b"\r\n")
            self.objs[num] = (val, stream)
        if not self.objs:
            raise PdfError("no indirect objects found")
        self.trailer = self._find_trailer()

    def _find_trailer(self) -> Dict[str, object]:
        for m in _TRAILER_RE.finditer(self.data):
            lex = _Lexer(self.data, m.end())
            try:
                val = lex.parse_value()
            except PdfError:
                continue
            if isinstance(val, dict) and "/Root" in val:
                return val
        # no classic trailer (e.g. xref stream): find the catalog
        for num, (d, _s) in self.objs.items():
            if isinstance(d, dict) and d.get("/Type") == "/Catalog":
                return {"/Root": Ref(num)}
        raise PdfError("no trailer / catalog")

    def resolve(self, val):
        seen = 0
        while isinstance(val, Ref):
            entry = self.objs.get(val.num)
            if entry is None:
                return None
            val = entry[0]
            seen += 1
            if seen > 64:
                raise PdfError("reference cycle")
        return val

    def stream_of(self, ref) -> bytes:
        if not isinstance(ref, Ref):
            raise PdfError("/Contents is not a stream reference")
        entry = self.objs.get(ref.num)
        if entry is None or entry[1] is None:
            raise PdfError(f"object {getattr(ref, 'num', '?')} has no stream")
        d, raw = entry
        filt = d.get("/Filter")
        filters = filt if isinstance(filt, list) else \
            ([] if filt is None else [filt])
        for f in filters:
            f = self.resolve(f) if isinstance(f, Ref) else f
            if f == "/FlateDecode":
                try:
                    raw = zlib.decompress(raw)
                except zlib.error as exc:
                    raise PdfError(f"bad Flate stream: {exc}") from exc
            else:
                raise PdfError(f"unsupported filter {f}")
        return raw

    def pages(self) -> List[Dict[str, object]]:
        root = self.resolve(self.trailer.get("/Root"))
        if not isinstance(root, dict):
            raise PdfError("bad /Root")
        out: List[Dict[str, object]] = []

        def walk(node, depth: int) -> None:
            node = self.resolve(node)
            if not isinstance(node, dict) or depth > 64:
                return
            if node.get("/Type") == "/Page":
                out.append(node)
                return
            for kid in self.resolve(node.get("/Kids")) or []:
                walk(kid, depth + 1)

        walk(root.get("/Pages"), 0)
        return out


# ---------------------------------------------------------------------------
# content-stream text interpreter
# ---------------------------------------------------------------------------

def _tokenize_content(data: bytes):
    """Yield (kind, value) tokens: 'str' bytes, 'num' float,
    'name' str, 'op' str, 'arr' marker."""
    pos = 0
    n = len(data)
    while pos < n:
        c = data[pos]
        if c in _WS:
            pos += 1
            continue
        if c == 0x25:  # % comment
            while pos < n and data[pos] not in b"\r\n":
                pos += 1
            continue
        if c == 0x28:  # (
            lex = _Lexer(data, pos)
            yield ("str", lex._parse_literal_string())
            pos = lex.pos
            continue
        if c == 0x3C and data[pos:pos + 2] != b"<<":  # hex string
            lex = _Lexer(data, pos)
            yield ("str", lex._parse_hex_string())
            pos = lex.pos
            continue
        if data[pos:pos + 2] == b"<<":
            lex = _Lexer(data, pos)
            lex._parse_dict()
            yield ("dict", None)
            pos = lex.pos
            continue
        if c == 0x5B:  # [
            yield ("arr_open", None)
            pos += 1
            continue
        if c == 0x5D:
            yield ("arr_close", None)
            pos += 1
            continue
        if c == 0x2F:  # name
            lex = _Lexer(data, pos)
            yield ("name", lex._parse_name())
            pos = lex.pos
            continue
        m = _NUM_RE.match(data, pos)
        if m:
            yield ("num", float(m.group()))
            pos = m.end()
            continue
        # operator: run of non-ws, non-delim bytes (', " included)
        if c in b"'\"":
            yield ("op", chr(c))
            pos += 1
            continue
        start = pos
        while pos < n and data[pos] not in _WS and data[pos] not in _DELIM:
            pos += 1
        if pos == start:
            pos += 1  # skip stray delimiter
            continue
        yield ("op", data[start:pos].decode("latin-1", "replace"))


class _TextState:
    """Minimal PDF text state: matrix translation terms + leading.
    Full 6-term matrices are tracked for Tm; Td/TD compose onto the
    LINE matrix per spec."""

    __slots__ = ("lm", "tm", "leading", "font_size")

    def __init__(self):
        self.lm = [1.0, 0.0, 0.0, 1.0, 0.0, 0.0]
        self.tm = list(self.lm)
        self.leading = 0.0
        self.font_size = 12.0

    def set_tm(self, a, b, c, d, e, f):
        self.lm = [a, b, c, d, e, f]
        self.tm = list(self.lm)

    def td(self, tx, ty):
        a, b, c, d, e, f = self.lm
        self.lm = [a, b, c, d, tx * a + ty * c + e, tx * b + ty * d + f]
        self.tm = list(self.lm)

    def next_line(self):
        self.td(0.0, -self.leading)

    @property
    def xy(self) -> Tuple[float, float]:
        return self.tm[4], self.tm[5]


def extract_page_text(content: bytes) -> List[Tuple[float, float, float, str]]:
    """Interpret one page's content stream → raw show-op records
    ``(y, x, font_size, text)`` in stream order."""
    st = _TextState()
    in_text = False
    stack: List[float] = []
    names: List[str] = []
    arr: Optional[List[object]] = None
    shows: List[Tuple[float, float, float, str]] = []

    def show(raw: bytes) -> None:
        x, y = st.xy
        shows.append((y, x, st.font_size, _decode_pdf_string(raw)))

    for kind, val in _tokenize_content(content):
        if kind == "num":
            (arr if arr is not None else stack).append(val)
        elif kind == "str":
            if arr is not None:
                arr.append(val)
            else:
                stack.append(val)  # type: ignore[arg-type]
        elif kind == "name":
            names.append(val)
        elif kind == "arr_open":
            arr = []
        elif kind == "arr_close":
            stack.append(arr)  # type: ignore[arg-type]
            arr = None
        elif kind == "op":
            op = val
            try:
                if op == "BT":
                    st.lm = [1.0, 0.0, 0.0, 1.0, 0.0, 0.0]
                    st.tm = list(st.lm)
                    in_text = True
                elif op == "ET":
                    in_text = False
                elif op == "Tf" and stack:
                    st.font_size = float(stack[-1])
                elif op == "TL" and stack:
                    st.leading = float(stack[-1])
                elif op == "Td" and len(stack) >= 2:
                    st.td(float(stack[-2]), float(stack[-1]))
                elif op == "TD" and len(stack) >= 2:
                    st.leading = -float(stack[-1])
                    st.td(float(stack[-2]), float(stack[-1]))
                elif op == "Tm" and len(stack) >= 6:
                    st.set_tm(*[float(v) for v in stack[-6:]])
                elif op == "T*":
                    st.next_line()
                elif op == "Tj" and in_text and stack and \
                        isinstance(stack[-1], bytes):
                    show(stack[-1])
                elif op == "'" and in_text and stack and \
                        isinstance(stack[-1], bytes):
                    st.next_line()
                    show(stack[-1])
                elif op == '"' and in_text and stack and \
                        isinstance(stack[-1], bytes):
                    st.next_line()
                    show(stack[-1])
                elif op == "TJ" and in_text and stack and \
                        isinstance(stack[-1], list):
                    parts = [_decode_pdf_string(v)
                             for v in stack[-1] if isinstance(v, bytes)]
                    x, y = st.xy
                    shows.append((y, x, st.font_size, "".join(parts)))
            finally:
                stack.clear()
                names.clear()
    return shows


def pdf_text_lines(
    pdf_bytes: bytes, min_len: int = 2, y_tol: float = 0.5,
) -> Tuple[List[Tuple[str, str, Geom]], int]:
    """Full-document text extraction → ``(lines, n_pages)`` where
    each line is ``(line_id, text, (hpos, vpos, width, height))`` —
    the same triple shape :func:`..xmlmodel.get_xml_lines` returns,
    so the fused stage treats PDF and ALTO/PAGE uniformly.

    Line assembly: show ops on the same baseline (|Δy| ≤ ``y_tol``,
    in text space) join left-to-right into one line; a baseline
    change flushes. Geometry is REAL layout data: ``hpos`` = leftmost
    x, ``vpos`` = distance from the page top (MediaBox height − y −
    font size), ``width`` = x span (approximated with the Helvetica
    0.5-em mean advance for the final run), ``height`` = font size.
    Raises :class:`PdfError` on malformed input (error-row
    semantics, like ``ET.ParseError`` for the XML dialects).
    """
    doc = _PdfDoc(pdf_bytes)
    pages = doc.pages()
    if not pages:
        raise PdfError("no /Page objects reachable from /Root")
    out: List[Tuple[str, str, Geom]] = []
    for p_idx, page in enumerate(pages):
        media = doc.resolve(page.get("/MediaBox"))
        page_h = 792.0
        if isinstance(media, list) and len(media) == 4:
            try:
                page_h = float(doc.resolve(media[3]))
            except (TypeError, ValueError):
                pass
        raw_contents = page.get("/Contents")
        refs: List[Ref] = []
        if isinstance(raw_contents, Ref):
            entry = doc.objs.get(raw_contents.num)
            if entry is not None and entry[1] is None and \
                    isinstance(doc.resolve(raw_contents), list):
                # indirect object holding an ARRAY of stream refs
                refs = [r for r in doc.resolve(raw_contents)
                        if isinstance(r, Ref)]
            else:
                refs = [raw_contents]
        elif isinstance(raw_contents, list):
            refs = [r for r in raw_contents if isinstance(r, Ref)]
        elif raw_contents is not None:
            raise PdfError("unsupported /Contents shape")
        content = b"\n".join(doc.stream_of(r) for r in refs)
        shows = extract_page_text(content)
        # assemble lines: flush on baseline change (stream order —
        # PDF writers emit reading order; a y-sort would break
        # multi-column layouts worse than trusting the stream)
        cur_y: Optional[float] = None
        cur_parts: List[str] = []
        cur_x0 = 0.0
        cur_x1 = 0.0
        cur_fs = 12.0
        line_idx = 0

        def flush() -> None:
            nonlocal line_idx, cur_parts
            text = "".join(cur_parts)
            if len(text) >= min_len:
                vpos = int(round(page_h - (cur_y or 0.0) - cur_fs))
                geom: Geom = (int(round(cur_x0)), vpos,
                              int(round(max(cur_x1 - cur_x0, 0.0))),
                              int(round(cur_fs)))
                out.append((f"p{p_idx:04d}_l{line_idx:05d}", text, geom))
                line_idx += 1
            cur_parts = []

        for y, x, fs, text in shows:
            if cur_y is None or abs(y - cur_y) > y_tol:
                if cur_y is not None:
                    flush()
                cur_y, cur_x0, cur_fs = y, x, fs
                cur_x1 = x
            cur_x1 = max(cur_x1, x + 0.5 * fs * len(text))
            cur_parts.append(text)
        if cur_y is not None:
            flush()
    return out, len(pages)
