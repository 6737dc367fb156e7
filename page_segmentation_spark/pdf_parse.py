"""Deterministic PDF -> text-block parser (shared core, stdlib-only).

The north-star input is "HTML (and PDF byte streams)": this module is the
PDF twin of :mod:`page_segmentation_spark.html_parse` — the second decode
front-end feeding the same node contract (the reference analogously
decodes multiple image formats through one loader,
``DatasetLoader.load_images``, reference lib/dataset.py:160-191).  The
SAME function is called by the single-node oracle and the Spark
``mapInArrow`` parse stage (via :mod:`page_segmentation_spark.page_parse`),
so extracted text is byte-identical by construction.

Scope (documented, honest): minimal text extraction for text-op PDFs —

  * object streams: raw and ``/FlateDecode`` (zlib, stdlib); compressed
    object streams (``/Type /ObjStm``) are unpacked so dictionaries
    stored inside them (fonts, resources) stay resolvable;
  * ``/Length``: direct, or indirect (``6 0 R``) resolved through the
    object map, else the endstream scan;
  * text blocks: every ``BT .. ET`` segment becomes one node, in byte
    order of the content streams (the 1-D reading order of this engine);
  * show ops: literal ``( .. )`` strings (with escape + octal handling)
    and hex ``< .. >`` strings, concatenated per segment (covers
    Tj / ' / " / TJ arrays);
  * CID fonts: fonts carrying a ``/ToUnicode`` CMap (bfchar + bfrange,
    itself raw or Flate) have their show-op bytes decoded as 2-byte CIDs
    through the CMap — the common shape of real-crawl PDFs;
  * font state: ``Tf`` PERSISTS across text objects and content streams
    (PDF graphics state), so a document that sets the font once does not
    tag later blocks as size 0.0;
  * tag: from the font size active at the segment's first show op:
    >= 18 -> h1, >= 13.5 -> h2, else p — the structural analog of DOM
    block tags;
  * link chars: PDFs have no inline anchors (hyperlinks live in /Annots
    geometry, which a 1-D node model cannot represent) — link density
    comes from URL-shaped tokens in the visible text, a deterministic,
    content-based heuristic.

The object map is regex-scanned (``N 0 obj .. endobj``), not xref-driven:
a binary stream payload containing the byte string ``endobj`` can
truncate that one entry, in which case the affected font/CMap lookup is
skipped — content extraction itself never depends on the object map.
Anything outside this scope (encrypted PDFs, CIDToGIDMap-only fonts
without /ToUnicode, content in XObjects) parses to whatever text ops are
visible — never an error (malformed inputs must not fail a batch, same
contract as parse_html).
"""

from __future__ import annotations

import re
import zlib
from typing import Any, Dict, List, Optional, Tuple

from page_segmentation_spark.html_parse import text_stats

_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n", re.S)
_BT_RE = re.compile(rb"\bBT\b(.*?)\bET\b", re.S)
_TF_RE = re.compile(rb"/([A-Za-z0-9]+)\s+([0-9]+(?:\.[0-9]+)?)\s+Tf")
_OBJ_RE = re.compile(rb"(\d+)\s+0\s+obj\b(.*?)\bendobj", re.S)
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\s+\d+\s+R)")
_LENGTH_REF_RE = re.compile(rb"/Length\s+(\d+)\s+0\s+R")
_INT_RE = re.compile(rb"^\s*(\d+)\s*$")

_ESCAPES = {
    b"n"[0]: b"\n",
    b"r"[0]: b"\r",
    b"t"[0]: b"\t",
    b"b"[0]: b"\b",
    b"f"[0]: b"\f",
    b"("[0]: b"(",
    b")"[0]: b")",
    b"\\"[0]: b"\\",
}


def _decode_literal(data: bytes, i: int) -> Tuple[bytes, int]:
    """Decode a PDF literal string starting at data[i] == '('; returns
    (raw bytes, index just past the closing paren).  Handles escapes,
    octal codes, and balanced nested parens."""
    out: List[bytes] = []
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
                out.append(bytes([int(bytes(oct_digits), 8) & 0xFF]))
            elif e in (0x0A, 0x0D):  # line continuation
                if e == 0x0D and i + 1 < n and data[i + 1] == 0x0A:
                    i += 1
            else:
                out.append(_ESCAPES.get(e, bytes([e])))
            i += 1
        elif c == 0x28:  # (
            depth += 1
            out.append(b"(")
            i += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth > 0:
                out.append(b")")
            i += 1
        else:
            out.append(bytes([c]))
            i += 1
    return b"".join(out), i


def _decode_hex(data: bytes, i: int) -> Tuple[bytes, int]:
    """Decode a hex string starting at data[i] == '<' to raw bytes."""
    j = data.find(b">", i)
    if j < 0:
        return b"", len(data)
    hexdigits = bytes(
        ch for ch in data[i + 1: j] if ch not in b" \t\r\n"
    )
    if len(hexdigits) % 2:
        hexdigits += b"0"
    try:
        return bytes.fromhex(hexdigits.decode("ascii")), j + 1
    except ValueError:
        return b"", j + 1


def _slice_payload(
    data: bytes, start: int, dict_bytes: bytes,
    objects: Optional[Dict[int, bytes]] = None,
) -> Optional[bytes]:
    """Slice a stream payload starting at ``start`` (just past the
    ``stream`` keyword + EOL).  A direct or object-resolved ``/Length``
    slices exactly — trimming trailing newlines heuristically corrupts
    compressed payloads whose last bytes happen to be 0x0a/0x0d.
    Fallback: endstream scan."""
    ln = None
    mlen = _LENGTH_RE.search(dict_bytes)
    if mlen:
        ln = int(mlen.group(1))
    elif objects is not None:
        mref = _LENGTH_REF_RE.search(dict_bytes)
        if mref:
            body = objects.get(int(mref.group(1)))
            if body is not None:
                mint = _INT_RE.match(body)
                if mint:
                    ln = int(mint.group(1))
    if ln is not None:
        if data[start + ln: start + ln + 16].lstrip(b"\r\n ").startswith(
            b"endstream"
        ):
            return data[start: start + ln]
    end = data.find(b"endstream", start)
    if end < 0:
        return None
    return data[start:end].rstrip(b"\r\n")


def _maybe_inflate(payload: bytes, dict_bytes: bytes) -> Optional[bytes]:
    if b"/FlateDecode" in dict_bytes:
        try:
            return zlib.decompress(payload)
        except zlib.error:
            return None
    return payload


def _object_stream_payload(
    body: bytes, objects: Optional[Dict[int, bytes]] = None
) -> Optional[bytes]:
    """Decoded stream payload of one object body, or None."""
    m = _STREAM_RE.search(body)
    if not m:
        return None
    payload = _slice_payload(body, m.end(), m.group(1), objects)
    if payload is None:
        return None
    return _maybe_inflate(payload, m.group(1))


def parse_objects(data: bytes) -> Dict[int, bytes]:
    """Object number -> body bytes, including objects unpacked from
    compressed object streams (``/Type /ObjStm``: header of N
    (objnum, offset) integer pairs, then the serialized objects at
    /First + offset)."""
    objs: Dict[int, bytes] = {
        int(m.group(1)): m.group(2) for m in _OBJ_RE.finditer(data)
    }
    for body in list(objs.values()):
        if b"/ObjStm" not in body:
            continue
        m_n = re.search(rb"/N\s+(\d+)", body)
        m_first = re.search(rb"/First\s+(\d+)", body)
        payload = _object_stream_payload(body, objs)
        if not (m_n and m_first and payload):
            continue
        n, first = int(m_n.group(1)), int(m_first.group(1))
        header = payload[:first].split()
        if len(header) < 2 * n:
            continue
        pairs = [
            (int(header[2 * i]), int(header[2 * i + 1])) for i in range(n)
        ]
        for i, (onum, off) in enumerate(pairs):
            end = pairs[i + 1][1] if i + 1 < n else len(payload) - first
            objs.setdefault(onum, payload[first + off: first + end])
    return objs


def _utf16be_str(hexdigits: bytes) -> str:
    try:
        b = bytes.fromhex(hexdigits.decode("ascii"))
    except ValueError:
        return ""
    if len(b) % 2:
        b += b"\x00"
    return b.decode("utf-16-be", errors="replace")


_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
_BFPAIR_RE = re.compile(rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>")
_BFRANGE_ENTRY_RE = re.compile(
    rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*(\[[^\]]*\]|<[0-9A-Fa-f]+>)"
)


def parse_cmap(payload: bytes) -> Dict[int, str]:
    """CID -> unicode map from a /ToUnicode CMap stream: bfchar pairs,
    bfrange with a base destination (incrementing) or an explicit
    destination array.  Destinations are UTF-16BE per the spec."""
    out: Dict[int, str] = {}
    for m in _BFCHAR_RE.finditer(payload):
        for pm in _BFPAIR_RE.finditer(m.group(1)):
            out[int(pm.group(1), 16)] = _utf16be_str(pm.group(2))
    for m in _BFRANGE_RE.finditer(payload):
        for rm in _BFRANGE_ENTRY_RE.finditer(m.group(1)):
            lo, hi = int(rm.group(1), 16), int(rm.group(2), 16)
            dst = rm.group(3)
            if hi - lo > 0xFFFF:  # malformed range guard
                continue
            if dst.startswith(b"["):
                items = re.findall(rb"<([0-9A-Fa-f]+)>", dst)
                for k, it in enumerate(items):
                    if lo + k <= hi:
                        out[lo + k] = _utf16be_str(it)
            else:
                base_hex = dst[1:-1]
                width = len(base_hex)
                try:
                    base = int(base_hex, 16)
                except ValueError:
                    continue
                for c in range(lo, hi + 1):
                    out[c] = _utf16be_str(
                        (b"%0*x" % (width, base + (c - lo)))
                    )
    return out


_FONT_RES_RE = re.compile(rb"/Font\s*<<(.*?)>>", re.S)
_FONT_REF_RE = re.compile(rb"/([A-Za-z0-9]+)\s+(\d+)\s+0\s+R")
_TOUNICODE_RE = re.compile(rb"/ToUnicode\s+(\d+)\s+0\s+R")


def font_cmaps(
    data: bytes, objects: Dict[int, bytes]
) -> Dict[str, Dict[int, str]]:
    """Resource font name -> CID map, for fonts that declare /ToUnicode.
    Resources are scanned in the raw bytes AND in ObjStm-unpacked object
    bodies (page dictionaries commonly live in object streams)."""
    scopes = [data] + [
        b for b in objects.values() if b"/Font" in b
    ]
    name2obj: Dict[str, int] = {}
    for scope in scopes:
        for m in _FONT_RES_RE.finditer(scope):
            for fm in _FONT_REF_RE.finditer(m.group(1)):
                name2obj.setdefault(
                    fm.group(1).decode("latin-1"), int(fm.group(2))
                )
    out: Dict[str, Dict[int, str]] = {}
    for name, onum in name2obj.items():
        body = objects.get(onum)
        if body is None:
            continue
        mtu = _TOUNICODE_RE.search(body)
        if not mtu:
            continue
        tu_body = objects.get(int(mtu.group(1)))
        if tu_body is None:
            continue
        payload = _object_stream_payload(tu_body, objects)
        if payload is None:
            continue
        cmap = parse_cmap(payload)
        if cmap:
            out[name] = cmap
    return out


def content_streams(
    data: bytes, objects: Optional[Dict[int, bytes]] = None
) -> List[bytes]:
    """All decoded content-stream payloads in byte order; FlateDecode
    streams are zlib-inflated, undecodable streams are skipped.  Streams
    that are machinery rather than page content (/ObjStm packing,
    /ToUnicode CMaps) are excluded."""
    out: List[bytes] = []
    for m in _STREAM_RE.finditer(data):
        if b"/ObjStm" in m.group(1) or b"/ToUnicode" in m.group(1):
            continue
        payload = _slice_payload(data, m.end(), m.group(1), objects)
        if payload is None:
            continue
        payload = _maybe_inflate(payload, m.group(1))
        if payload is None:
            continue
        out.append(payload)
    return out


#: carried graphics state: (font resource name, font size)
FontState = Tuple[str, float]


def _apply_tf(chunk: bytes, state: FontState) -> FontState:
    """Fold any Tf ops in a non-text chunk into the carried state."""
    for m in _TF_RE.finditer(chunk):
        state = (m.group(1).decode("latin-1"), float(m.group(2)))
    return state


def _bytes_to_text(
    raw: bytes, font: str, cmaps: Dict[str, Dict[int, str]]
) -> str:
    """Show-op bytes -> text: 2-byte CIDs through the font's /ToUnicode
    CMap when one exists (unmapped CIDs drop — they have no unicode
    meaning), else latin-1 per byte (simple fonts)."""
    cmap = cmaps.get(font)
    if cmap is None:
        return raw.decode("latin-1")
    parts: List[str] = []
    for k in range(0, len(raw) - 1, 2):
        cid = (raw[k] << 8) | raw[k + 1]
        mapped = cmap.get(cid)
        if mapped is not None:
            parts.append(mapped)
    return "".join(parts)


def _segment_text(
    seg: bytes, state: FontState, cmaps: Dict[str, Dict[int, str]]
) -> Tuple[str, float, FontState]:
    """One BT..ET segment -> (text, size at first show op, new state).
    Walks the segment sequentially so Tf ops update the carried state in
    byte order (PDF graphics state persists across text objects)."""
    parts: List[str] = []
    size_at_show: Optional[float] = None
    tf_matches = list(_TF_RE.finditer(seg))
    ti = 0
    i, n = 0, len(seg)
    while i < n:
        while ti < len(tf_matches) and tf_matches[ti].end() <= i:
            m = tf_matches[ti]
            state = (m.group(1).decode("latin-1"), float(m.group(2)))
            ti += 1
        c = seg[i]
        if c == 0x28:  # (
            if size_at_show is None:
                size_at_show = state[1]
            raw, i = _decode_literal(seg, i)
            parts.append(_bytes_to_text(raw, state[0], cmaps))
        elif c == 0x3C and not (i + 1 < n and seg[i + 1] == 0x3C):  # < not <<
            if size_at_show is None:
                size_at_show = state[1]
            raw, i = _decode_hex(seg, i)
            parts.append(_bytes_to_text(raw, state[0], cmaps))
        else:
            i += 1
    while ti < len(tf_matches):  # Tf after the last show op still persists
        m = tf_matches[ti]
        state = (m.group(1).decode("latin-1"), float(m.group(2)))
        ti += 1
    return (
        "".join(parts),
        state[1] if size_at_show is None else size_at_show,
        state,
    )


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
        # the object map is only needed for CID fonts / ObjStm / indirect
        # /Length — all cheap regex passes; content scan never fails if
        # the map is incomplete
        objects = parse_objects(data)
        cmaps = font_cmaps(data, objects)
        blocks: List[tuple] = []
        state: FontState = ("", 0.0)
        for stream in content_streams(data, objects):
            pos = 0
            for m in _BT_RE.finditer(stream):
                state = _apply_tf(stream[pos: m.start()], state)
                raw, size, state = _segment_text(m.group(1), state, cmaps)
                pos = m.end()
                text = " ".join(raw.split())
                if text:
                    blocks.append((size, text))
            state = _apply_tf(stream[pos:], state)
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
