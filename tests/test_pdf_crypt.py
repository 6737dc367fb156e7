"""RC4-encrypted PDFs (standard security handler, empty user password)
decrypt to the same node stream as their plaintext twins.

The ciphertext comes from :func:`datagen.encrypt_pdf` — an
INDEPENDENT implementation of the public ISO 32000-1 algorithms (its
own RC4, its own Algorithm-2 key derivation, its own object walk) —
so every round trip here cross-validates two separate codebases
against the spec: a key-derivation bug in ``pdf_parse.build_decryptor``
would have to be reproduced identically in datagen to pass."""

from page_segmentation_spark.datagen import (
    build_cid_pdf,
    build_pdf,
    build_xref_pdf,
    encrypt_pdf,
)
from page_segmentation_spark.pdf_parse import build_decryptor, parse_pdf

_BLOCKS = [
    (24, "Encrypted title here"),
    (11, "Body paragraph that survives (with parens) and a \\ backslash"),
]


def test_rc4_roundtrip_plain_stream():
    plain = build_pdf(_BLOCKS)
    enc = encrypt_pdf(plain)
    assert b"Encrypted title here" not in enc  # actually ciphered
    nodes = parse_pdf(plain)
    assert parse_pdf(enc) == nodes
    assert [n["text"] for n in nodes] == [b[1] for b in _BLOCKS]


def test_rc4_roundtrip_flate_stream():
    # PDF order: compress THEN encrypt (RC4 wraps the stored bytes)
    plain = build_pdf(_BLOCKS, compress=True)
    nodes = parse_pdf(plain)
    assert parse_pdf(encrypt_pdf(plain)) == nodes
    assert nodes and nodes[0]["tag"] == "h1"


def test_rc4_r2_40bit():
    plain = build_pdf(_BLOCKS)
    assert parse_pdf(encrypt_pdf(plain, v=1, r=2, nbits=40)) == parse_pdf(
        plain
    )


def test_rc4_key_parameters_matter():
    # different /O or /ID must yield different ciphertext (i.e. the
    # derivation actually consumes its inputs on both sides)
    plain = build_pdf(_BLOCKS)
    a = encrypt_pdf(plain)
    b = encrypt_pdf(plain, owner_entry=bytes(range(0x40, 0x60)))
    c = encrypt_pdf(plain, file_id=bytes(16))
    assert a != b and a != c and b != c
    assert parse_pdf(a) == parse_pdf(b) == parse_pdf(c) == parse_pdf(plain)


def test_rc4_encrypted_cid_cmap():
    # the /ToUnicode CMap stream is encrypted too — font_cmaps must
    # decrypt it with the CMap object's OWN per-object key
    blocks = [(24, "Café titre"), (11, "corps du texte ascii")]
    plain = build_cid_pdf(blocks)
    nodes = parse_pdf(plain)
    assert [n["text"] for n in nodes] == ["Café titre", "corps du texte ascii"]
    assert parse_pdf(encrypt_pdf(plain)) == nodes


def test_rc4_encrypted_objstm_and_xref():
    # ObjStm payloads and xref-stream resolution under encryption: the
    # packed objects decrypt with the ObjStm object's key, and xref
    # offsets stay valid because RC4 preserves length
    plain_objstm = build_cid_pdf(
        [(24, "Titre"), (11, "corps ascii")], objstm=True
    )
    assert parse_pdf(encrypt_pdf(plain_objstm)) == parse_pdf(plain_objstm)

    plain_xref = build_xref_pdf(_BLOCKS, xref_stream=True, form_xobject=True)
    nodes = parse_pdf(plain_xref)
    assert [n["text"] for n in nodes] == [b[1] for b in _BLOCKS]
    assert parse_pdf(encrypt_pdf(plain_xref)) == nodes


def test_unsupported_handler_never_raises():
    # AES (/V 4) is out of scope: parse degrades, never errors
    enc = encrypt_pdf(build_pdf(_BLOCKS))
    aes = enc.replace(b"/V 2", b"/V 4")
    assert build_decryptor(aes) is None
    assert isinstance(parse_pdf(aes), list)


def test_unencrypted_files_unaffected():
    assert build_decryptor(build_pdf(_BLOCKS)) is None
