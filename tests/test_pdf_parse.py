"""PDF byte-stream parse path (north-star: "HTML (and PDF byte streams)"):
parser unit semantics + Spark-vs-oracle byte-identity on a mixed corpus."""

from page_segmentation_spark.datagen import (
    build_pdf,
    make_pdf_page,
    mixed_pages_df,
)
from page_segmentation_spark.oracle import extract_document
from page_segmentation_spark.page_parse import parse_page
from page_segmentation_spark.pdf_parse import parse_pdf
from page_segmentation_spark.plans.extract import extract


def test_pdf_nodes_tags_and_order():
    pdf = build_pdf([(24, "Title line"), (11, "Body one"), (14, "Sub"),
                     (9, "footer text")])
    nodes = parse_pdf(pdf)
    assert [n["tag"] for n in nodes] == ["h1", "p", "h2", "p"]
    assert [n["text"] for n in nodes] == [
        "Title line", "Body one", "Sub", "footer text"
    ]
    assert [n["node_idx"] for n in nodes] == [0, 1, 2, 3]
    assert all(n["is_fg"] for n in nodes)


def test_pdf_flate_and_raw_streams_equal():
    blocks = [(24, "Same content"), (11, "in both encodings")]
    raw = parse_pdf(build_pdf(blocks, compress=False))
    flate = parse_pdf(build_pdf(blocks, compress=True))
    assert raw == flate


def test_pdf_string_escapes_and_hex():
    pdf = build_pdf([(11, "parens (nested (deep)) and \\ slash")])
    (n,) = parse_pdf(pdf)
    assert n["text"] == "parens (nested (deep)) and \\ slash"
    # hand-built hex string + octal escape
    content = b"BT /F1 11 Tf 72 700 Td <48656C6C6F> Tj (\\110i) Tj ET"
    stream = (
        b"%PDF-1.4\n1 0 obj\n<< /Length "
        + str(len(content)).encode() + b" >>\nstream\n"
        + content + b"\nendstream\nendobj\n"
    )
    (n2,) = parse_pdf(stream)
    assert n2["text"] == "HelloHi"  # hex 'Hello' + octal \110 = 'H'


def test_pdf_url_link_chars():
    pdf = build_pdf([(9, "go to http://a.test/x or www.b.test now")])
    (n,) = parse_pdf(pdf)
    assert n["n_link_chars"] == len("http://a.test/x") + len("www.b.test")


def test_pdf_malformed_never_raises():
    assert parse_pdf(b"%PDF-1.4 nothing here") == []
    assert parse_pdf(b"\x00\x01\x02") == []
    # truncated stream
    assert parse_pdf(b"%PDF-1.4\n<< /Length 5 >>\nstream\nBT (x") == []


def test_parse_page_dispatch():
    row = make_pdf_page(2)
    assert parse_page(row["html"])[0]["tag"] == "h1"
    assert parse_page("<p>html text here</p>")[0]["tag"] == "p"


def test_mixed_corpus_byte_identity(spark):
    """The flagship plan over a mixed HTML+PDF corpus must equal the
    oracle byte-for-byte on every url (CLAUDE.md invariant #1 extended to
    the PDF front-end)."""
    from page_segmentation_spark.datagen import make_page

    n = 16
    pages = mixed_pages_df(spark, n, partitions=3, pdf_every=4)
    rows = {r["url"]: r for r in extract(pages).collect()}
    assert len(rows) == n
    n_pdf = 0
    for i in range(n):
        p = make_pdf_page(i) if i % 4 == 0 else make_page(i)
        exp = extract_document(p["html"])
        got = rows[p["url"]]
        assert got["extracted_text"] == exp["extracted_text"], p["url"]
        assert got["n_nodes"] == exp["n_nodes"], p["url"]
        if i % 4 == 0:
            n_pdf += 1
            assert exp["n_nodes"] > 0  # PDFs really parsed
    assert n_pdf == 4


def test_pdf_furniture_by_relative_font_size():
    """Blocks far below the char-weighted median body size are layout
    furniture (container='footer'); body and headings are not."""
    pdf = build_pdf([
        (24, "Big Title Here"),
        (11, "body paragraph one with a reasonable amount of text"),
        (11, "body paragraph two with a reasonable amount of text"),
        (9, "tiny legal footer line www.example.test"),
    ])
    nodes = parse_pdf(pdf)
    assert [n["container"] for n in nodes] == ["", "", "", "footer"]


def test_pdf_footer_not_voted_into_body_run():
    """A furniture block must not be flipped to main by the adjacent body
    paragraphs' majority vote (component runs split on container) and
    must stay out of the extraction."""
    p = make_pdf_page(1)
    r = extract_document(p["html"])
    assert "example.test" not in r["extracted_text"]
    assert p["text"].split(" ")[0] in r["extracted_text"]


def test_pdf_tj_arrays_and_multiple_streams():
    """TJ show arrays (kerning numbers between literals) concatenate their
    string parts; multiple content streams parse in byte order."""
    c1 = b"BT /F1 11 Tf 72 700 Td [(Hel) -20 (lo ) 15 (world)] TJ ET"
    c2 = b"BT /F1 11 Tf 72 680 Td (second stream) Tj ET"
    pdf = b"%PDF-1.4\n"
    for c in (c1, c2):
        pdf += (b"9 0 obj\n<< /Length " + str(len(c)).encode()
                + b" >>\nstream\n" + c + b"\nendstream\nendobj\n")
    nodes = parse_pdf(pdf)
    assert [n["text"] for n in nodes] == ["Hello world", "second stream"]


# ----------------------------------------------------- round-3 coverage

def _wrap_raw_content(content: bytes) -> bytes:
    return (
        b"%PDF-1.4\n4 0 obj\n<< /Length " + str(len(content)).encode()
        + b" >>\nstream\n" + content + b"\nendstream\nendobj\n%%EOF\n"
    )


def test_tf_persists_across_text_objects():
    """PDF graphics state: a font set once applies to every later text
    object — blocks without their own Tf must NOT fall back to size 0.0
    (which tagged them footer furniture)."""
    content = (
        b"BT /F1 11 Tf 72 760 Td (First body paragraph here) Tj ET\n"
        b"BT 72 740 Td (Second paragraph no Tf op) Tj ET\n"
        b"BT 72 720 Td (Third paragraph still body size) Tj ET"
    )
    nodes = parse_pdf(_wrap_raw_content(content))
    assert [n["text"] for n in nodes] == [
        "First body paragraph here",
        "Second paragraph no Tf op",
        "Third paragraph still body size",
    ]
    assert [n["tag"] for n in nodes] == ["p", "p", "p"]
    assert all(n["container"] == "" for n in nodes)  # no furniture


def test_tf_persists_across_streams_and_outside_bt():
    """Tf between text objects (outside BT..ET) and across content
    streams carries forward."""
    s1 = b"/F1 24 Tf\nBT 72 760 Td (Title sized outside BT) Tj ET"
    s2 = b"BT 72 740 Td (Next stream same font) Tj ET"
    pdf = (
        b"%PDF-1.4\n"
        + b"".join(
            b"<< /Length " + str(len(c)).encode() + b" >>\nstream\n"
            + c + b"\nendstream\n"
            for c in (s1, s2)
        )
        + b"%%EOF\n"
    )
    nodes = parse_pdf(pdf)
    assert [n["tag"] for n in nodes] == ["h1", "h1"]


def test_cid_pdf_decodes_through_tounicode_cmap():
    from page_segmentation_spark.datagen import build_cid_pdf

    blocks = [(24, "Café menü — the title"),
              (11, "plain ascii body text")]
    nodes = parse_pdf(build_cid_pdf(blocks))
    assert [n["text"] for n in nodes] == [
        "Café menü — the title", "plain ascii body text"
    ]
    assert [n["tag"] for n in nodes] == ["h1", "p"]


def test_cid_pdf_objstm_and_indirect_length():
    """Font + page dicts packed in a compressed /ObjStm, content stream
    /Length as an indirect reference — both resolved via the object map."""
    from page_segmentation_spark.datagen import build_cid_pdf

    blocks = [(24, "Packed title"), (11, "body via objstm")]
    for objstm, indirect in ((True, False), (False, True), (True, True)):
        nodes = parse_pdf(
            build_cid_pdf(blocks, objstm=objstm, indirect_length=indirect)
        )
        assert [n["text"] for n in nodes] == [
            "Packed title", "body via objstm"
        ], (objstm, indirect)


def test_cid_pdf_full_pipeline_byte_identity(spark):
    """extract() over a CID PDF equals the single-node oracle byte-for-
    byte (same shared parser, asserted end-to-end)."""
    from page_segmentation_spark.datagen import build_cid_pdf

    pdf = build_cid_pdf(
        [(24, "Unicode title — café"),
         (11, "A body paragraph that is long enough to be kept as main "
              "content by the scorer with margin"),
         (11, "A second body paragraph keeps the span well formed here"),
         (8, "Visit http://example.test/terms for the legal notices")]
    )
    want = extract_document(pdf)["extracted_text"]
    assert "café" in want and "legal notices" not in want
    df = spark.createDataFrame([("u1", pdf)], "url string, html binary")
    row = extract(df).collect()[0]
    assert row["extracted_text"] == want


def test_pdf_fixture_escaping_roundtrip(spark, tmp_path):
    """ADVICE item: paren/backslash/non-ASCII text through the in-plan
    PDF builder must survive the build->parse roundtrip (escaping + octet
    /Length).  Non-ASCII literal bytes decode latin-1 per byte (simple
    font, no CMap) — the expected text models that."""
    import pandas as pd

    from page_segmentation_spark.queries import pdf_pages_from_documents

    texts = [
        "plain ascii body text long enough to extract with margin",
        "parens (nested (deep)) and \\ backslash \\( tricky here",
        "non-ascii café über straße text body here",
    ]
    pdf_docs = pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts,
         "lang": ["en"] * len(texts)}
    )
    spark.createDataFrame(pdf_docs).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    pages = pdf_pages_from_documents(spark, str(tmp_path))
    from page_segmentation_spark.pdf_parse import parse_pdf as pp

    for r in pages.collect():
        doc_id = int(r["url"].rsplit("/", 1)[1].split(".")[0])
        t = texts[doc_id]
        mangled = t.encode("utf-8").decode("latin-1")
        nodes = pp(bytes(r["html"]))
        assert nodes[0]["text"] == f"Document {doc_id}"
        assert nodes[1]["text"].startswith(" ".join(mangled.split()))
        assert nodes[2]["text"].startswith(
            " ".join(mangled[::-1].split())
        ) or nodes[2]["text"].startswith(" ".join(t[::-1].encode("utf-8").decode("latin-1").split()))
        assert len(nodes) == 4  # footer parsed too -> /Length exact


# ---------------------------------------------------- xref + Form XObjects


def _xref_blocks():
    return [
        (24, "The Actual Title"),
        (11, "First body paragraph with enough words to look real."),
        (11, "Second body paragraph, also part of the main content."),
        (9, "Visit http://example.test/terms for the legal notices"),
    ]


def test_xref_stream_container_extracts_identically():
    """The same blocks must extract byte-identically whether the file
    carries a classic xref table, an xref stream, or a predictor-coded
    xref stream (container format is invisible to the node contract)."""
    from page_segmentation_spark.datagen import build_pdf, build_xref_pdf

    want = [n["text"] for n in parse_pdf(build_pdf(_xref_blocks()))]
    assert want, "baseline empty"
    for kwargs in (
        {},
        {"xref_stream": True},
        {"xref_stream": True, "predictor": True},
    ):
        got = [n["text"] for n in parse_pdf(build_xref_pdf(_xref_blocks(), **kwargs))]
        assert got == want, kwargs


def test_form_xobject_content_walked_inline():
    """Body blocks living in a /Subtype /Form XObject (invoked via Do)
    must extract at the invocation site, in order, with font-size tags
    flowing through the form boundary."""
    from page_segmentation_spark.datagen import build_pdf, build_xref_pdf

    base = parse_pdf(build_pdf(_xref_blocks()))
    for xs in (False, True):
        nodes = parse_pdf(
            build_xref_pdf(_xref_blocks(), form_xobject=True, xref_stream=xs)
        )
        assert [n["text"] for n in nodes] == [n["text"] for n in base], xs
        assert [n["tag"] for n in nodes] == [n["tag"] for n in base], xs


def test_endobj_trap_needs_xref_resolution():
    """A binary payload embedding 'endobj' + fake object headers poisons
    the regex object scan (the form body vanishes); the xref overlay
    restores it.  Proves object resolution is genuinely xref-driven."""
    from page_segmentation_spark import pdf_parse as P
    from page_segmentation_spark.datagen import build_xref_pdf

    data = build_xref_pdf(
        _xref_blocks(), form_xobject=True, endobj_trap=True, xref_stream=True
    )
    # regex-only scan is poisoned: the fake 6 0 obj body hides /Form
    regex_objs = {
        int(m.group(1)): m.group(2) for m in P._OBJ_RE.finditer(data)
    }
    assert b"/Poisoned" in regex_objs[6]
    # full resolution (xref overlay) recovers the real form
    objs = P.parse_objects(data)
    assert b"/Form" in objs[6]
    texts = [n["text"] for n in parse_pdf(data)]
    assert "First body paragraph with enough words to look real." in texts
    assert "Second body paragraph, also part of the main content." in texts


def test_xref_parse_classic_and_stream():
    """parse_xref returns the same offsets for classic and stream xrefs
    of the same object layout."""
    from page_segmentation_spark import pdf_parse as P
    from page_segmentation_spark.datagen import build_xref_pdf

    classic = build_xref_pdf(_xref_blocks())
    stream = build_xref_pdf(_xref_blocks(), xref_stream=True)
    off_c, ins_c = P.parse_xref(classic)
    off_s, ins_s = P.parse_xref(stream)
    assert set(off_c) == {1, 2, 3, 4, 5}
    assert {k: v for k, v in off_s.items() if k <= 5} == off_c
    assert ins_c == {} and ins_s == {}


def test_form_xobject_cycle_guard():
    """A self-invoking form must terminate (ancestor cycle guard)."""
    from page_segmentation_spark.datagen import build_xref_pdf

    data = build_xref_pdf(_xref_blocks(), form_xobject=True)
    # make the form invoke itself: append a Do to its own stream
    data = data.replace(b"ET\nendstream", b"ET\n/Fm1 Do\nendstream", 1)
    nodes = parse_pdf(data)  # must not hang or raise
    assert any("First body paragraph" in n["text"] for n in nodes)


def test_malformed_xref_falls_back_to_regex_scan():
    """A corrupted startxref offset must degrade to the regex scan, not
    lose the document."""
    from page_segmentation_spark.datagen import build_xref_pdf

    data = build_xref_pdf(_xref_blocks())
    import re as _re

    data = _re.sub(rb"startxref\s+\d+", b"startxref\n999999999", data)
    texts = [n["text"] for n in parse_pdf(data)]
    assert "The Actual Title" in texts


def test_identity_h_ttf_cmap_reversal():
    """CID font with NO /ToUnicode: text is recoverable only by
    reversing the embedded FontFile2's TrueType cmap (format 4) under
    /Identity-H — both the /Identity and stream CIDToGIDMap shapes."""
    from page_segmentation_spark.datagen import build_ttf_pdf

    blocks = [(24, "Café titre — grand"), (11, "corps ascii (parens ok)")]
    for stream_map in (False, True):
        nodes = parse_pdf(build_ttf_pdf(blocks, cid_to_gid_stream=stream_map))
        assert [n["text"] for n in nodes] == [b[1] for b in blocks]
        assert nodes[0]["tag"] == "h1"


def test_identity_h_ttf_encrypted():
    # FontFile2 and CIDToGIDMap streams decrypt with their own keys
    from page_segmentation_spark.datagen import build_ttf_pdf, encrypt_pdf

    blocks = [(24, "Title"), (11, "Body text with ü and é")]
    plain = build_ttf_pdf(blocks, cid_to_gid_stream=True)
    assert parse_pdf(encrypt_pdf(plain)) == parse_pdf(plain)
    assert [n["text"] for n in parse_pdf(plain)] == [b[1] for b in blocks]


def test_ttf_cmap_parser_degrades():
    """Broken/missing font structures must degrade to visible text ops
    (here: none decodable), never raise."""
    from page_segmentation_spark.datagen import build_ttf_pdf
    from page_segmentation_spark.pdf_parse import parse_ttf_cmap

    import pytest as _pytest

    for bad in (b"", b"\x00\x01\x00\x00", b"\x00\x01\x00\x00" + b"\x00" * 40):
        with _pytest.raises(ValueError):
            parse_ttf_cmap(bad)
    # break the FontFile2 link (dangling object ref): the show string
    # degrades to raw visible bytes (whatever-is-visible contract) with
    # no exception — and no longer spells the true text
    data = build_ttf_pdf([(24, "Title")])
    dangling = data.replace(b"/FontFile2 9 0 R", b"/FontFile2 99 0 R")
    texts = [n["text"] for n in parse_pdf(dangling)]
    assert "Title" not in texts
    # corrupt the compressed font bytes: inflate fails -> same degrade
    import zlib as _zlib

    from page_segmentation_spark.datagen import build_ttf_cmap_font

    good_z = _zlib.compress(build_ttf_cmap_font(), 6)
    bad_z = good_z[:10] + bytes([good_z[10] ^ 0xFF]) + good_z[11:]
    assert "Title" not in [
        n["text"] for n in parse_pdf(data.replace(good_z, bad_z))
    ]


def test_cff_simple_font_decodes_through_naming_tables():
    """Simple font with a /FontFile3 CFF program and a CUSTOM byte
    encoding (codes 0x80+): text is recoverable ONLY by walking the CFF
    charset + Encoding + standard-strings/String-INDEX chain — a
    latin-1 fallback would emit high-byte garbage."""
    from page_segmentation_spark.datagen import build_cff_pdf

    blocks = [
        (24, "CFF Title Here"),
        (11, "Body text with été accents, digits 42 and punctuation."),
    ]
    nodes = parse_pdf(build_cff_pdf(blocks))
    assert [n["text"] for n in nodes] == [b[1] for b in blocks]
    assert nodes[0]["tag"] == "h1"


def test_cff_differences_overlay():
    """/Encoding /Differences in the font dict overrides the CFF's
    built-in code assignments: ints set the code, names assign
    sequentially, unknown names UNMAP the code (glyph renders but has
    no recoverable text meaning)."""
    from page_segmentation_spark.datagen import build_cff_font, build_cff_pdf

    blocks = [(11, "abc")]
    _cff, char2code = build_cff_font("abc")
    # remap 'a' and 'b' codes to uppercase names; kill 'c' with an
    # unknown ornament name
    diffs = [char2code["a"], "A", "B", char2code["c"], "ornament7"]
    nodes = parse_pdf(build_cff_pdf(blocks, differences=diffs))
    assert [n["text"] for n in nodes] == ["AB"]


def test_cff_standard_encoding_path():
    """A CFF whose TopDICT omits the Encoding op (offset 0 = Standard):
    codes ARE ASCII and map through code -> SID = code - 31."""
    from page_segmentation_spark.datagen import build_cff_font
    from page_segmentation_spark.pdf_parse import parse_cff_charmap

    cff, char2code = build_cff_font("Az 9.")
    # rewrite the Encoding operand (second 1d-int32 entry) to 0
    i = cff.find(b"\x1d", cff.find(b"\x1d") + 1)
    std = cff[:i + 1] + (0).to_bytes(4, "big") + cff[i + 5:]
    m = parse_cff_charmap(std)
    assert {chr(c): s for c, s in m.items()} == {
        ch: ch for ch in "Az 9."
    }


def test_cff_parser_degrades():
    """Out-of-scope/broken CFFs raise ValueError from the parser and
    degrade to visible bytes in the full pipeline — never an
    exception."""
    import pytest as _pytest

    from page_segmentation_spark.datagen import build_cff_font, build_cff_pdf
    from page_segmentation_spark.pdf_parse import parse_cff_charmap

    for bad in (b"", b"\x01\x00\x04\x01", b"\x01\x00\x04\x01" + b"\xff" * 8):
        with _pytest.raises((ValueError, IndexError)):
            parse_cff_charmap(bad)
    # CID-keyed CFF (ROS in TopDICT) is out of scope
    cff, _ = build_cff_font("ab")
    # splice a ROS-bearing topdict is intrusive; instead break the link:
    data = build_cff_pdf([(11, "ab")])
    dangling = data.replace(b"/FontFile3 9 0 R", b"/FontFile3 99 0 R")
    nodes = parse_pdf(dangling)  # degrades to raw bytes, no exception
    assert all("ab" != n["text"] for n in nodes)


def test_embedded_cmap_non_identity_encoding():
    """Type0 font whose /Encoding is an embedded CMap STREAM (codes at
    0xE000+GID -> CIDs via cidchar + cidrange) with no /ToUnicode: the
    full non-Identity chain composes code->CID->GID->unicode."""
    from page_segmentation_spark.datagen import build_cidcmap_pdf

    blocks = [(24, "Café titre — grand"), (11, "corps ascii (parens ok)")]
    nodes = parse_pdf(build_cidcmap_pdf(blocks))
    assert [n["text"] for n in nodes] == [b[1] for b in blocks]
    assert nodes[0]["tag"] == "h1"


def test_embedded_cmap_rejects_non_2byte_codespace():
    from page_segmentation_spark.pdf_parse import parse_cid_cmap

    one_byte = (
        b"begincodespacerange\n<00> <ff>\nendcodespacerange\n"
        b"begincidrange\n<00> <ff> 0\nendcidrange"
    )
    assert parse_cid_cmap(one_byte) is None
    two_byte = (
        b"begincodespacerange\n<0000> <ffff>\nendcodespacerange\n"
        b"begincidchar\n<e001> 7\nendcidchar"
    )
    assert parse_cid_cmap(two_byte) == {0xE001: 7}


def test_differences_without_font_program():
    """A base-14 / program-less simple font with /Encoding /Differences:
    the overlay applies over ASCII identity (remapped codes decode
    through their glyph names, others stay themselves); a bare base
    font with no Differences keeps the latin-1 fast path byte-for-byte."""
    def make(enc: bytes) -> bytes:
        content = b"BT /F1 12 Tf 72 700 Td (AB hello there) Tj ET"
        return (
            b"%PDF-1.4\n"
            b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
            b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
            b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
            b"/Resources << /Font << /F1 5 0 R >> >> >>\nendobj\n"
            b"4 0 obj\n<< /Length " + str(len(content)).encode()
            + b" >>\nstream\n" + content + b"\nendstream\nendobj\n"
            b"5 0 obj\n<< /Type /Font /Subtype /Type1 "
            b"/BaseFont /Helvetica" + enc + b" >>\nendobj\n"
            b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
        )

    diffs = b" /Encoding << /Differences [ 65 /a /uni00E9 ] >>"
    assert parse_pdf(make(diffs))[0]["text"] == "aé hello there"
    assert parse_pdf(make(b""))[0]["text"] == "AB hello there"
