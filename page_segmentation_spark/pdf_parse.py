"""Deterministic PDF -> text-block parser (shared core, stdlib-only).

The north-star input is "HTML (and PDF byte streams)": this module is the
PDF twin of :mod:`page_segmentation_spark.html_parse` — the second decode
front-end feeding the same node contract (the reference analogously
decodes multiple image formats through one loader,
``DatasetLoader.load_images``, reference lib/dataset.py:160-191).  The
SAME function is called by the single-node oracle and the Spark
``mapInArrow`` parse stage (via :mod:`page_segmentation_spark.page_parse`),
so extracted text is byte-identical by construction.

Scope (documented, honest): minimal text extraction for linearized
text-op PDFs —

  * object streams: raw and ``/FlateDecode`` (zlib, stdlib);
  * text blocks: every ``BT .. ET`` segment becomes one node, in byte
    order of the content streams (the 1-D reading order of this engine);
  * show ops: literal ``( .. )`` strings (with escape + octal handling)
    and hex ``< .. >`` strings, concatenated per segment (covers
    Tj / ' / " / TJ arrays);
  * tag: from the active font size at the segment start (``Tf``):
    >= 18 -> h1, >= 13.5 -> h2, else p — the structural analog of DOM
    block tags;
  * link chars: PDFs have no inline anchors (hyperlinks live in /Annots
    geometry, which a 1-D node model cannot represent) — link density
    comes from URL-shaped tokens in the visible text, a deterministic,
    content-based heuristic.

Anything outside this scope (encrypted PDFs, CMap-encoded fonts, content
in XObjects) parses to whatever text ops are visible — never an error
(malformed inputs must not fail a batch, same contract as parse_html).
"""

from __future__ import annotations

import re
import zlib
from typing import Any, Dict, List

from page_segmentation_spark.html_parse import text_stats

_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n", re.S)
_BT_RE = re.compile(rb"\bBT\b(.*?)\bET\b", re.S)
_TF_RE = re.compile(rb"/[A-Za-z0-9]+\s+([0-9]+(?:\.[0-9]+)?)\s+Tf")

_ESCAPES = {
    b"n"[0]: "\n",
    b"r"[0]: "\r",
    b"t"[0]: "\t",
    b"b"[0]: "\b",
    b"f"[0]: "\f",
    b"("[0]: "(",
    b")"[0]: ")",
    b"\\"[0]: "\\",
}


def _decode_literal(data: bytes, i: int) -> tuple[str, int]:
    """Decode a PDF literal string starting at data[i] == '('; returns
    (text, index just past the closing paren).  Handles escapes, octal
    codes, and balanced nested parens."""
    out: List[str] = []
    depth = 1
    i += 1
    n = len(data)
    while i < n and depth > 0:
        c = data[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = data[i]
            if 0x30 <= e <= 0x37:  # octal \d{1,3}
                oct_digits = [e]
                for _ in range(2):
                    if i + 1 < n and 0x30 <= data[i + 1] <= 0x37:
                        i += 1
                        oct_digits.append(data[i])
                out.append(chr(int(bytes(oct_digits), 8) & 0xFF))
            elif e in (0x0A, 0x0D):  # line continuation
                if e == 0x0D and i + 1 < n and data[i + 1] == 0x0A:
                    i += 1
            else:
                out.append(_ESCAPES.get(e, chr(e)))
            i += 1
        elif c == 0x28:  # (
            depth += 1
            out.append("(")
            i += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth > 0:
                out.append(")")
            i += 1
        else:
            out.append(chr(c))
            i += 1
    return "".join(out), i


def _decode_hex(data: bytes, i: int) -> tuple[str, int]:
    """Decode a hex string starting at data[i] == '<'."""
    j = data.find(b">", i)
    if j < 0:
        return "", len(data)
    hexdigits = bytes(
        ch for ch in data[i + 1: j] if ch not in b" \t\r\n"
    )
    if len(hexdigits) % 2:
        hexdigits += b"0"
    try:
        return bytes.fromhex(hexdigits.decode("ascii")).decode("latin-1"), j + 1
    except ValueError:
        return "", j + 1


_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\s+\d+\s+R)")


def content_streams(data: bytes) -> List[bytes]:
    """All decoded stream payloads in byte order; FlateDecode streams are
    zlib-inflated, undecodable streams are skipped.

    A direct ``/Length`` slices the payload exactly — trimming trailing
    newlines heuristically corrupts compressed payloads whose last bytes
    happen to be 0x0a/0x0d.  Indirect lengths (``6 0 R``) fall back to
    the endstream scan."""
    out: List[bytes] = []
    for m in _STREAM_RE.finditer(data):
        start = m.end()
        mlen = _LENGTH_RE.search(m.group(1))
        payload = None
        if mlen:
            ln = int(mlen.group(1))
            if data[start + ln: start + ln + 16].lstrip(b"\r\n ").startswith(
                b"endstream"
            ):
                payload = data[start: start + ln]
        if payload is None:
            end = data.find(b"endstream", start)
            if end < 0:
                continue
            payload = data[start:end].rstrip(b"\r\n")
        if b"/FlateDecode" in m.group(1):
            try:
                payload = zlib.decompress(payload)
            except zlib.error:
                continue
        out.append(payload)
    return out


def _segment_text(seg: bytes) -> tuple[str, float]:
    """Concatenated show-op text of one BT..ET segment + the font size
    active at its first show op (0.0 if none declared)."""
    parts: List[str] = []
    size = 0.0
    size_seen = False
    i = 0
    n = len(seg)
    while i < n:
        c = seg[i]
        if c == 0x28:  # (
            if not size_seen:
                mf = None
                for mf in _TF_RE.finditer(seg, 0, i):
                    pass
                if mf is not None:
                    size = float(mf.group(1))
                size_seen = True
            txt, i = _decode_literal(seg, i)
            parts.append(txt)
        elif c == 0x3C and not (i + 1 < n and seg[i + 1] == 0x3C):  # < not <<
            if not size_seen:
                mf = None
                for mf in _TF_RE.finditer(seg, 0, i):
                    pass
                if mf is not None:
                    size = float(mf.group(1))
                size_seen = True
            txt, i = _decode_hex(seg, i)
            parts.append(txt)
        else:
            i += 1
    return "".join(parts), size


def _tag_for_size(size: float) -> str:
    if size >= 18.0:
        return "h1"
    if size >= 13.5:
        return "h2"
    return "p"


def _url_link_chars(text: str) -> int:
    """Deterministic link-char heuristic: total length of URL-shaped
    tokens (http/https scheme or www. prefix)."""
    return sum(
        len(tok)
        for tok in text.split()
        if tok.startswith(("http://", "https://", "www."))
    )


#: furniture threshold: a block whose font is below this fraction of the
#: body size is layout furniture (footnote / running footer — footnotes
#: are conventionally ~0.8x body).
FURNITURE_RATIO = 0.85


def _body_size(blocks: List[tuple]) -> float:
    """Char-weighted median font size — the dominant body size.  Robust
    to a long footer or a big title (mode-by-chars is not)."""
    total = sum(len(t) for _s, t in blocks)
    if total == 0:
        return 0.0
    cum = 0
    for s, t in sorted(blocks, key=lambda b: b[0]):
        cum += len(t)
        if cum * 2 >= total:
            return s
    return blocks[-1][0]


def parse_pdf(
    data: bytes | bytearray, max_nodes: int = 50_000
) -> List[Dict[str, Any]]:
    """Parse one PDF byte stream into ordered node records with the SAME
    fields as :func:`page_segmentation_spark.html_parse.parse_html`
    (NODE_FIELDS contract).

    PDFs have no DOM sectioning, so the ``container`` field carries the
    layout-derived furniture signal instead: blocks rendered far below
    the document's body font size (char-weighted median) are footnote /
    running-footer furniture and get container='footer' — the same
    boilerplate prior a <footer> ancestor gives an HTML node."""
    nodes: List[Dict[str, Any]] = []
    try:
        data = bytes(data)
        blocks: List[tuple] = []
        for stream in content_streams(data):
            for m in _BT_RE.finditer(stream):
                raw, size = _segment_text(m.group(1))
                text = " ".join(raw.split())
                if text:
                    blocks.append((size, text))
        body = _body_size(blocks)
        for size, text in blocks:
            if len(nodes) >= max_nodes:
                return nodes
            furniture = body > 0.0 and size < FURNITURE_RATIO * body
            rec: Dict[str, Any] = {
                "node_idx": len(nodes),
                "tag": _tag_for_size(size),
                "container": "footer" if furniture else "",
                "depth": 1,
                "text": text,
                "is_fg": True,
            }
            rec.update(text_stats(text, _url_link_chars(text)))
            nodes.append(rec)
    except Exception:
        # malformed PDF: keep whatever was parsed (never fail a batch)
        pass
    return nodes
