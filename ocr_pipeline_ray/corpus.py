"""Deterministic synthetic Common-Crawl-style page corpus.

Generates the engine's input table ``(url, warc_ts, html, text, lang)``
(BASELINE.json ``input_hint``) from a fixed seed — no external data.
The generated HTML exercises every behavior FIXTURES.md §1 calls for:
boilerplate (nav/footer/sidebar/link-farms), hyphenated line wraps
(incl. the hyphen-before-empty-line drop quirk), historical-German
confusion characters (``ſ``, ``ic)``, ``s<``, ``<``, ``3``-for-``s``
before quotes), RTL marks + ``dir="rtl"`` blocks, empty/degenerate and
malformed pages, invalid-UTF-8 rows, exact-duplicate urls,
near-duplicate documents, per-host skew and page-size skew.

Everything derives from ``random.Random(seed)`` streams keyed by shard
index, so any shard regenerates identically in isolation (resumable
generation, stable tests).
"""

from __future__ import annotations

import os
import random
from datetime import datetime, timedelta
from typing import List, Optional, Tuple

import pyarrow as pa
import pyarrow.parquet as pq

from .schema import PAGES_SCHEMA

_VOCAB = (
    "der die das und nicht mit sich auf für als auch wird einer haben "
    "werden wasser turm strasse kirche garten winter sommer morgen abend "
    "geschichte wissenschaft bibliothek universität druckerei papier "
    "buchstabe seite zeile wort sprache deutsch historisch alt neu gross "
    "klein schnell langsam hell dunkel schwer leicht stadt land fluss "
    "berg tal wald feld haus hof tor brücke markt platz herr frau kind "
    "vater mutter bruder schwester freund nachbar meister schüler lehrer "
    "pfarrer bürger bauer handwerk gewerbe handel ware preis geld silber "
    "gold eisen kupfer stein holz glas leder wolle leinen tuch brot wein "
    "bier korn mehl salz zucker honig milch käse fleisch fisch apfel "
    "birne kirsche nuss kraut blume gras baum blatt wurzel frucht samen "
    "licht schatten feuer rauch asche erde staub regen schnee wind sturm "
    "wolke himmel stern mond sonne tag nacht stunde woche monat jahr "
    "zeit leben tod krieg friede recht gesetz ordnung freiheit wahrheit "
    "glaube hoffnung liebe freude leid schmerz angst mut kraft macht "
    "ehre ruhm name zeichen bild schrift brief bote weg reise fahrt "
    "schiff wagen pferd esel rind schaf ziege huhn gans taube falke "
    "wolf fuchs hase hirsch bär löwe adler schlange fliege biene"
).split()

_EN_VOCAB = (
    "the quick brown fox jumps over lazy dog history library science "
    "university press paper letter page line word language old new great "
    "small fast slow light dark heavy town country river mountain forest "
    "field house yard gate bridge market place time life year month week"
).split()

_HOSTS_HOT = ["de.archive-hub.example", "zeitung.example"]
_HOSTS_COLD = [
    "stadtarchiv.example", "digitale-bibliothek.example", "chronik.example",
    "landesmuseum.example", "kirchenbuch.example", "altstadt.example",
    "quellen.example", "handschriften.example", "drucke.example",
    "urkunden.example",
]

_BASE_TS = datetime(2024, 3, 1, 0, 0, 0)


def _sentence(rng: random.Random, vocab: List[str], n_words: int) -> List[str]:
    words = [rng.choice(vocab) for _ in range(n_words)]
    words[0] = words[0].capitalize()
    return words


def _corrupt_token(rng: random.Random, token: str) -> str:
    """Inject one confusion pattern into a token (OCR-noise analogue)."""
    roll = rng.random()
    if roll < 0.30 and "s" in token:
        return token.replace("s", "ſ", 1)
    if roll < 0.45 and token.endswith("ich"):
        return token[:-2] + "c)"
    if roll < 0.60 and "sc" in token:
        return token.replace("sc", "s<", 1)
    if roll < 0.70 and "c" in token:
        return token.replace("c", "<", 1)
    if roll < 0.85 and "s" in token:
        # regex fixture: [aeioubcglnt]3[:-]*" — consonant/vowel + 3 + quote
        idx = token.find("s")
        if idx > 0 and token[idx - 1] in "aeioubcglnt":
            return token[: idx] + '3"' + token[idx + 1:]
        return token + '3"'
    return token + "…"


def _paragraph_html(
    rng: random.Random, vocab: List[str], n_lines: int, noise: float,
    hyphen_wraps: bool,
) -> Tuple[str, int]:
    """One <p> with <br>-separated lines; returns (html, n_wraps_made)."""
    lines: List[str] = []
    n_wraps = 0
    for _ in range(n_lines):
        words = _sentence(rng, vocab, rng.randint(5, 11))
        if noise > 0:
            words = [
                _corrupt_token(rng, w) if rng.random() < noise else w
                for w in words
            ]
        lines.append(" ".join(words))
    if hyphen_wraps and n_lines >= 2 and rng.random() < 0.6:
        # split a word across a line boundary with a trailing hyphen
        i = rng.randrange(n_lines - 1)
        donor = lines[i].rsplit(" ", 1)
        if len(donor) == 2 and len(donor[1]) > 4:
            head, word = donor
            cut = len(word) // 2
            lines[i] = f"{head} {word[:cut]}-"
            lines[i + 1] = f"{word[cut:]} {lines[i + 1]}"
            n_wraps += 1
    return "<p>" + "<br/>".join(lines) + "</p>", n_wraps


def _boilerplate_nav(rng: random.Random) -> str:
    items = "".join(
        f'<li><a href="/{w}.html">{w.capitalize()}</a></li>'
        for w in rng.sample(_VOCAB, 6)
    )
    return f"<nav><ul>{items}</ul></nav>"


def _boilerplate_footer(rng: random.Random) -> str:
    return (
        "<footer><p>Impressum Datenschutz Kontakt "
        f"{rng.choice(_VOCAB)} {rng.choice(_VOCAB)}</p></footer>"
    )


def _link_farm(rng: random.Random) -> str:
    links = " ".join(
        f'<a href="/{w}-{i}.html">{w} archiv seite</a>'
        for i, w in enumerate(rng.sample(_VOCAB, 8))
    )
    return f'<div class="related">{links}</div>'


def _sidebar(rng: random.Random) -> str:
    return (
        '<div class="sidebar"><p>Werbung Anzeige '
        f"{rng.choice(_VOCAB)}</p></div>"
    )


def _rtl_block(rng: random.Random) -> str:
    words = rng.sample(_VOCAB, 4)
    marked = words[0] + "‏"
    return f'<p dir="rtl">{marked} {" ".join(words[1:])}</p>'


def _alto_doc(rng: random.Random, idx: int, vocab: List[str]) -> bytes:
    """Synthetic ALTO v3/v4 document (real geometry, short-line filter
    fixture)."""
    version = rng.choice(["3", "4"])
    ns = f"http://www.loc.gov/standards/alto/ns-v{version}#"
    lines = []
    n_lines = rng.randint(3, 8)
    for li in range(n_lines):
        words = _sentence(rng, vocab, rng.randint(4, 8))
        strings = "".join(f'<String CONTENT="{w}"/>' for w in words)
        hpos, vpos = 80 + rng.randint(0, 40), 100 + 30 * li
        lines.append(
            f'<TextLine ID="tl_{idx}_{li}" HPOS="{hpos}" VPOS="{vpos}" '
            f'WIDTH="{12 * sum(len(w) + 1 for w in words)}" HEIGHT="24">'
            f"{strings}</TextLine>"
        )
    # short line: joined CONTENT below min_len → filtered (M5 fixture)
    lines.append('<TextLine ID="tl_short" HPOS="0" VPOS="0" WIDTH="9" '
                 'HEIGHT="9"><String CONTENT="a"/></TextLine>')
    return (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f'<alto xmlns="{ns}"><Layout><Page ID="p{idx}"><PrintSpace>'
        f'<TextBlock>{"".join(lines)}</TextBlock>'
        "</PrintSpace></Page></Layout></alto>"
    ).encode("utf-8")


def _page_doc(rng: random.Random, idx: int, vocab: List[str]) -> bytes:
    """Synthetic PAGE 2013/2019 document: center-sorted words, an
    invalid-coords line, and (rarely) the words-without-line-text
    error fixture."""
    year = rng.choice(["2013-07-15", "2019-07-15"])
    ns = f"http://schema.primaresearch.org/PAGE/gts/pagecontent/{year}"
    lines = []
    n_lines = rng.randint(2, 5)
    for li in range(n_lines):
        words = _sentence(rng, vocab, rng.randint(3, 6))
        vpos = 100 + 30 * li
        # word elements in SHUFFLED document order; center-x encodes
        # the true reading order (the extractor must sort by center)
        order = list(range(len(words)))
        rng.shuffle(order)
        word_els = []
        for pos in order:
            x0 = 80 + 90 * pos
            word_els.append(
                f'<Word id="w{li}_{pos}"><Coords points="{x0},{vpos} '
                f'{x0 + 80},{vpos} {x0 + 80},{vpos + 24} {x0},{vpos + 24}"/>'
                f"<TextEquiv><Unicode>{words[pos]}</Unicode></TextEquiv></Word>"
            )
        text = " ".join(words)
        x_max = 80 + 90 * len(words)
        lines.append(
            f'<TextLine id="ln_{idx}_{li}"><Coords points="80,{vpos} '
            f'{x_max},{vpos} {x_max},{vpos + 24} 80,{vpos + 24}"/>'
            f'{"".join(word_els)}'
            f"<TextEquiv><Unicode>{text}</Unicode></TextEquiv></TextLine>"
        )
    # invalid-coords line without words → dropped (valid=False fixture)
    lines.append('<TextLine id="ln_invalid"><Coords points=""/>'
                 "<TextEquiv><Unicode>unsichtbare zeile</Unicode></TextEquiv>"
                 "</TextLine>")
    if rng.random() < 0.10:
        # words-without-line-text → whole document errors (reference
        # RuntimeError / StepException skip semantics)
        lines.append(
            '<TextLine id="ln_bad"><Coords points="0,0 9,9"/>'
            '<Word id="wb"><Coords points="0,0 9,9"/>'
            "<TextEquiv><Unicode>verwaist</Unicode></TextEquiv></Word>"
            "<TextEquiv><Unicode></Unicode></TextEquiv></TextLine>"
        )
    return (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f'<PcGts xmlns="{ns}"><Page><TextRegion>'
        f'{"".join(lines)}'
        "</TextRegion></Page></PcGts>"
    ).encode("utf-8")


def build_page(rng: random.Random, idx: int, kind: str, lang: str) -> bytes:
    """Render one deterministic HTML page of the given fixture kind."""
    vocab = _EN_VOCAB if lang == "en" else _VOCAB
    noise = 0.18 if lang == "de" else 0.0
    if kind == "alto_xml":
        return _alto_doc(rng, idx, vocab)
    if kind == "page_xml":
        return _page_doc(rng, idx, vocab)
    if kind == "pdf":
        from .functions.pdf import doc_to_pdf

        lines = [" ".join(_sentence(rng, vocab, rng.randint(5, 11)))
                 for _ in range(rng.randint(4, 18))]
        return doc_to_pdf(lines, lines_per_page=6)
    head = (
        "<html><head><title>Seite {}</title>"
        "<script>var x = 1;</script><style>.a{{color:red}}</style>"
        "</head><body>"
    ).format(idx)
    parts: List[str] = [head, _boilerplate_nav(rng)]
    if kind == "normal" or kind == "big":
        n_paras = rng.randint(3, 6) if kind == "normal" else rng.randint(60, 90)
        for _ in range(n_paras):
            para, _w = _paragraph_html(
                rng, vocab, rng.randint(2, 6), noise, hyphen_wraps=True
            )
            parts.append(para)
        if rng.random() < 0.35:
            parts.append(_link_farm(rng))
        if rng.random() < 0.25:
            parts.append(_sidebar(rng))
        if rng.random() < 0.10:
            parts.append(_rtl_block(rng))
    elif kind == "empty_nodes":
        parts.append("<p>   </p><div><p></p></div>")
        para, _w = _paragraph_html(rng, vocab, 3, noise, hyphen_wraps=False)
        parts.append(para)
        parts.append("<p>‏‎</p>")
    elif kind == "degenerate":
        parts.append("<main><div>  </div></main>")
    elif kind == "hyphen_empty_quirk":
        # hyphen-ending line followed by an empty line: the QA wrap
        # sanitizer must DROP the hyphen line (lib/ocr_step.py:485-487)
        para, _w = _paragraph_html(rng, vocab, 2, noise, hyphen_wraps=False)
        parts.append("<p>Wasser- trink<br/>   <br/>danach weiter gehen</p>")
        parts.append(para)
    elif kind == "malformed":
        para, _w = _paragraph_html(rng, vocab, 2, noise, hyphen_wraps=False)
        parts.append("<div><p>Unclosed anfang " + para)
    parts.append(_boilerplate_footer(rng))
    parts.append("</body></html>")
    return "".join(parts).encode("utf-8")


_KIND_WHEEL = (
    ["normal"] * 76
    + ["empty_nodes"] * 5
    + ["degenerate"] * 3
    + ["hyphen_empty_quirk"] * 3
    + ["malformed"] * 4
    + ["big"] * 3
    + ["alto_xml"] * 4
    + ["page_xml"] * 2
)


def generate_pages_table(
    n_rows: int,
    seed: int = 42,
    shard: int = 0,
    dup_fraction: float = 0.03,
    near_dup_fraction: float = 0.03,
    invalid_utf8_fraction: float = 0.005,
    pdf_fraction: float = 0.0,
) -> pa.Table:
    """Build one deterministic shard of the pages table.

    ``pdf_fraction`` opts a share of rows into real PDF payloads
    (mixed-format corpus). It defaults to 0.0 and, when 0, consumes
    no RNG draws — the long-pinned HTML/ALTO/PAGE fixture bytes are
    unchanged for every existing (seed, shard).
    """
    rng = random.Random(f"{seed}:{shard}")
    urls: List[str] = []
    tss: List[datetime] = []
    htmls: List[bytes] = []
    texts: List[Optional[str]] = []
    langs: List[str] = []

    base_idx = shard * 10_000_000
    i = 0
    while i < n_rows:
        idx = base_idx + i
        lang = "en" if rng.random() < 0.08 else "de"
        # hot hosts own ~20% of rows (skew fixture)
        if rng.random() < 0.20:
            host = rng.choice(_HOSTS_HOT)
        else:
            host = rng.choice(_HOSTS_COLD)
        kind = rng.choice(_KIND_WHEEL)
        if pdf_fraction > 0 and rng.random() < pdf_fraction:
            kind = "pdf"
        html = build_page(rng, idx, kind, lang)
        url = f"http://{host}/seite-{idx}.html"
        ts = _BASE_TS + timedelta(seconds=idx % 2_000_000)
        raw_text = "" if rng.random() < 0.3 else f"rohtext {idx}"
        urls.append(url)
        tss.append(ts)
        htmls.append(html)
        texts.append(raw_text)
        langs.append(lang)
        i += 1
        # exact duplicate url (same url+html, later crawl ts)
        if i < n_rows and rng.random() < dup_fraction:
            urls.append(url)
            tss.append(ts + timedelta(days=7))
            htmls.append(html)
            texts.append(raw_text)
            langs.append(lang)
            i += 1
        # near duplicate (distinct url, lightly edited content)
        if i < n_rows and rng.random() < near_dup_fraction:
            edited = html.replace(b"</body>", b"<p>kleine aenderung anhang</p></body>")
            urls.append(f"http://{host}/seite-{idx}-kopie.html")
            tss.append(ts + timedelta(hours=1))
            htmls.append(edited)
            texts.append(raw_text)
            langs.append(lang)
            i += 1
    # invalid UTF-8 rows (error-column fixture)
    n_bad = max(1, int(n_rows * invalid_utf8_fraction)) if n_rows >= 50 else 0
    for b in range(n_bad):
        pos = rng.randrange(len(htmls))
        htmls[pos] = b"<html><body><p>kaputt \xff\xfe seite</p></body></html>"

    return pa.Table.from_arrays(
        [
            pa.array(urls, pa.string()),
            pa.array(tss, pa.timestamp("us")),
            pa.array(htmls, pa.binary()),
            pa.array(texts, pa.string()),
            pa.array(langs, pa.string()),
        ],
        schema=PAGES_SCHEMA,
    )


def write_pages_corpus(
    out_dir: str,
    n_rows: int,
    seed: int = 42,
    n_shards: int = 8,
    overwrite: bool = False,
    pdf_fraction: float = 0.0,
) -> List[str]:
    """Write a sharded Parquet corpus; returns the shard file paths.

    One file per shard (the resume/lineage partition unit). Shards are
    independently regenerable: shard k depends only on (seed, k).
    """
    os.makedirs(out_dir, exist_ok=True)
    per_shard = [n_rows // n_shards] * n_shards
    for k in range(n_rows % n_shards):
        per_shard[k] += 1
    paths = []
    for shard, rows in enumerate(per_shard):
        path = os.path.join(out_dir, f"pages-{shard:05d}.parquet")
        paths.append(path)
        if os.path.exists(path) and not overwrite:
            continue
        table = generate_pages_table(rows, seed=seed, shard=shard,
                                     pdf_fraction=pdf_fraction)
        pq.write_table(table, path, compression="zstd")
    return paths
