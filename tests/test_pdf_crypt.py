"""Encrypted PDFs (standard security handler, empty user password) —
RC4 (/V 1-2) and AES-128-CBC (/V 4 /CFM /AESV2) — decrypt to the same
node stream as their plaintext twins.

The ciphertext comes from :func:`datagen.encrypt_pdf` — an
INDEPENDENT implementation of the public ISO 32000-1 algorithms (its
own RC4, its own AES forward cipher built from a Fermat-inverse S-box,
its own Algorithm-2 key derivation, its own object walk) — so every
round trip here cross-validates two separate codebases against the
spec: a key-derivation bug in ``pdf_parse.build_decryptor`` would have
to be reproduced identically in datagen to pass.  The AES cores are
additionally pinned one-sidedly to the published FIPS-197 appendix-C
vector, so the pair cannot even agree on a wrong cipher."""

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
    # /V 4 WITHOUT an /AESV2 crypt filter (e.g. /CFM /AESV3 or a bare
    # V bump) is out of scope: parse degrades, never errors
    enc = encrypt_pdf(build_pdf(_BLOCKS))
    aes = enc.replace(b"/V 2", b"/V 4")
    assert build_decryptor(aes) is None
    assert isinstance(parse_pdf(aes), list)


# -- AES-128 (/V 4 /CFM /AESV2) ------------------------------------------

_FIPS_KEY = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
_FIPS_PT = bytes.fromhex("00112233445566778899aabbccddeeff")
_FIPS_CT = bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a")


def test_aes_cores_match_fips197_vector():
    # datagen's forward cipher and pdf_parse's inverse cipher are
    # INDEPENDENT implementations; the published appendix-C vector
    # pins each side separately (not just to each other)
    from page_segmentation_spark.datagen import _enc_block, _enc_round_keys
    from page_segmentation_spark.pdf_parse import _aes_cbc_decrypt

    assert _enc_block(_enc_round_keys(_FIPS_KEY), _FIPS_PT) == _FIPS_CT
    # drive the decryptor through its public CBC shape with a zero IV:
    # plaintext block = D(ct) ^ IV = D(ct); pad the "document" so the
    # PKCS#7 strip removes a whole synthetic second block
    import hashlib

    from page_segmentation_spark.datagen import _enc_aes_cbc

    iv = bytes(16)
    ct = _enc_aes_cbc(_FIPS_KEY, iv, _FIPS_PT)
    assert ct[:16] == _FIPS_CT  # first CBC block with zero IV == ECB
    assert _aes_cbc_decrypt(_FIPS_KEY, iv + ct) == _FIPS_PT
    assert hashlib.md5(ct).hexdigest()  # ciphertext deterministic


def test_aesv2_roundtrip_plain_stream():
    plain = build_pdf(_BLOCKS)
    enc = encrypt_pdf(plain, v=4, r=4)
    assert b"Encrypted title here" not in enc  # actually ciphered
    assert parse_pdf(enc) == parse_pdf(plain)


def test_aesv2_roundtrip_flate_stream():
    # PDF order: compress THEN encrypt (AES wraps the stored bytes)
    plain = build_pdf(_BLOCKS, compress=True)
    assert parse_pdf(encrypt_pdf(plain, v=4, r=4)) == parse_pdf(plain)


def test_aesv2_roundtrip_cid_cmap():
    # /ToUnicode CMap streams decrypt with their own per-object AES key
    blocks = [(24, "Café titre"), (11, "corps du texte ascii")]
    plain = build_cid_pdf(blocks)
    nodes = parse_pdf(plain)
    assert [n["text"] for n in nodes] == ["Café titre", "corps du texte ascii"]
    assert parse_pdf(encrypt_pdf(plain, v=4, r=4)) == nodes


def test_aesv2_roundtrip_objstm():
    # objects packed in an /ObjStm decrypt with the ObjStm's key; the
    # re-serialized xref table must still resolve every object
    plain = build_cid_pdf([(24, "Titre"), (11, "corps ascii")], objstm=True)
    assert parse_pdf(encrypt_pdf(plain, v=4, r=4)) == parse_pdf(plain)


def test_aesv2_key_parameters_matter():
    plain = build_pdf(_BLOCKS)
    a = encrypt_pdf(plain, v=4, r=4)
    b = encrypt_pdf(plain, v=4, r=4, owner_entry=bytes(range(0x40, 0x60)))
    c = encrypt_pdf(plain, v=4, r=4, file_id=bytes(16))
    assert a != b and a != c and b != c
    assert parse_pdf(a) == parse_pdf(b) == parse_pdf(c) == parse_pdf(plain)


def test_aesv2_padding_multiple_of_16():
    # a payload already 16-aligned must gain (and then shed) a full
    # PKCS#7 pad block — the classic off-by-one-block bug
    from page_segmentation_spark.datagen import _enc_aes_cbc
    from page_segmentation_spark.pdf_parse import _aes_cbc_decrypt

    key = bytes(range(16))
    iv = bytes(range(100, 116))
    for n in (0, 16, 32, 15, 17):
        pt = bytes(range(40, 40 + n))
        ct = _enc_aes_cbc(key, iv, pt)
        assert len(ct) % 16 == 0 and len(ct) >= n + 1
        assert _aes_cbc_decrypt(key, iv + ct) == pt


def test_aes_malformed_payload_degrades():
    # ragged / short payloads return bytes, never raise
    from page_segmentation_spark.pdf_parse import _aes_cbc_decrypt

    key = bytes(16)
    assert _aes_cbc_decrypt(key, b"short") == b"short"
    assert _aes_cbc_decrypt(key, bytes(33)) == bytes(33)


def test_unencrypted_files_unaffected():
    assert build_decryptor(build_pdf(_BLOCKS)) is None
