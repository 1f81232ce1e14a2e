"""ALTO XML emission — the S4 writer made real (byte-deterministic).

The reference serializes every post-step result as pretty-printed
UTF-8 ALTO with CRLF line endings (`/root/reference/lib/ocr_step.py:
605-619`: pretty print, re-parse to normalize blanks, then replace
``\\n`` with ``\\r\\n``). This engine's deliverable is Parquet columns,
but for drop-in parity a user can materialize the same ALTO v4
documents from the ``lines`` column: :func:`doc_to_alto_xml` builds
the document with the reference's enrichment applied (fileIdentifier /
fileName from the doc id, ``Page@ID = page_id`` — `ocr_step.py:
539-555`), pretty-printed with 2-space indentation and CRLF endings.

Output is a pure function of its inputs (no timestamps, no
randomness) so the same row always serializes to the same bytes.
"""

from __future__ import annotations

from typing import Dict, List, Sequence
from xml.sax.saxutils import escape, quoteattr

ALTO_V4_NS = "http://www.loc.gov/standards/alto/ns-v4#"


def doc_to_alto_xml(
    doc_id: str,
    page_id: str,
    lines: Sequence[Dict],
    file_name: str = "",
) -> bytes:
    """lines (dicts with line_id/text/hpos/vpos/width/height) → ALTO v4.

    One ``String`` per line (CONTENT = the full normalized line text,
    geometry from the synthesized/parsed grid). Pretty-printed, CRLF,
    UTF-8 — the reference's write_xml_file contract.
    """
    out: List[str] = []
    put = out.append
    put('<?xml version="1.0" encoding="UTF-8"?>')
    put(f'<alto xmlns="{ALTO_V4_NS}">')
    put("  <Description>")
    put("    <sourceImageInformation>")
    put(f"      <fileIdentifier>{escape(doc_id)}</fileIdentifier>")
    put(f"      <fileName>{escape(file_name or doc_id)}</fileName>")
    put("    </sourceImageInformation>")
    put("  </Description>")
    put("  <Layout>")
    put(f"    <Page ID={quoteattr(page_id)}>")
    put("      <PrintSpace>")
    put("        <TextBlock>")
    for ln in lines or []:
        geom = (
            f'HPOS="{ln.get("hpos", 0)}" VPOS="{ln.get("vpos", 0)}" '
            f'WIDTH="{ln.get("width", 0)}" HEIGHT="{ln.get("height", 0)}"'
        )
        put(f'          <TextLine ID={quoteattr(str(ln.get("line_id", "")))} '
            f"{geom}>")
        put(f'            <String CONTENT={quoteattr(ln.get("text", ""))} '
            f"{geom}/>")
        put("          </TextLine>")
    put("        </TextBlock>")
    put("      </PrintSpace>")
    put("    </Page>")
    put("  </Layout>")
    put("</alto>")
    # CRLF endings incl. the trailing newline (write_xml_file parity:
    # the reference replaces every \n of the pretty print with \r\n)
    return ("\r\n".join(out) + "\r\n").encode("utf-8")


def alto_xml_fn(batch):
    """Batch op: append an ``alto_xml`` binary column built from the
    ``doc_id`` / ``page_id`` / ``lines`` columns (row-local, no
    shuffle). Attach after the extraction chain when ALTO output is
    wanted alongside the Parquet deliverable."""
    import pyarrow as pa

    doc_ids = batch.column("doc_id").to_pylist()
    page_ids = batch.column("page_id").to_pylist()
    lines_col = batch.column("lines").to_pylist()
    payloads = [
        doc_to_alto_xml(d or "", p or "", lines or [])
        for d, p, lines in zip(doc_ids, page_ids, lines_col)
    ]
    return batch.append_column("alto_xml", pa.array(payloads, pa.binary()))
