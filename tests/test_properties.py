"""Property-based tests (hypothesis) — SURVEY §5.3 invariants.

These run on the pure-Python core (parser + oracle), which the Spark side
is byte-identical to; no SparkSession needed, so hundreds of cases are
cheap.
"""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from page_segmentation_spark.config import ExtractSettings
from page_segmentation_spark.html_parse import parse_html, text_stats
from page_segmentation_spark.oracle import (
    cc_majority_vote,
    cut_spans,
    extract_document,
    score_nodes,
)

# -- arbitrary byte soup must never crash the parser and must keep node
#    invariants ------------------------------------------------------------

html_fragments = st.lists(
    st.one_of(
        st.sampled_from(
            ["<p>", "</p>", "<div>", "</div>", "<a href='x'>", "</a>",
             "<script>", "</script>", "<img/>", "<li>", "</li>", "<br>",
             "&amp;", "&#65;", "<!-- c -->", "<h1>", "</h1>"]
        ),
        st.text(max_size=30),
    ),
    max_size=40,
).map("".join)


@settings(max_examples=150, deadline=None)
@given(html_fragments)
def test_parser_invariants(html):
    nodes = parse_html(html, max_nodes=100)
    for i, n in enumerate(nodes):
        assert n["node_idx"] == i  # dense, ordered ids
        assert n["is_fg"] == (n["n_chars"] > 0)
        assert n["n_chars"] == len(n["text"])
        assert 0 <= n["n_link_chars"] <= n["n_chars"]
        for k in ("n_punct", "n_digits", "n_upper", "n_alpha"):
            assert 0 <= n[k] <= n["n_chars"]
        assert n["n_stop"] <= n["n_tokens"]
        assert n["text"] == " ".join(n["text"].split())  # ws-normalized


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=200))
def test_parser_never_crashes_on_bytes(data):
    nodes = parse_html(data, max_nodes=50)
    assert isinstance(nodes, list)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=120), st.integers(min_value=0, max_value=200))
def test_text_stats_bounds(text, link):
    text = " ".join(text.split())
    s = text_stats(text, link)
    assert s["n_link_chars"] <= s["n_chars"]
    assert s["n_upper"] <= s["n_alpha"] <= s["n_chars"]
    assert s["n_punct"] + s["n_alpha"] + s["n_digits"] <= s["n_chars"]


# -- vote/span invariants over arbitrary class vectors ---------------------

def _mk_nodes(preds, tags, fgs):
    return [
        {
            "node_idx": i, "tag": tags[i], "container": "", "is_fg": fgs[i],
            "n_chars": 10, "n_tokens": 2, "n_link_chars": 0, "n_punct": 0,
            "n_digits": 0, "n_upper": 0, "n_alpha": 10, "n_stop": 0,
            "depth": 1, "text": f"t{i}",
        }
        for i in range(len(preds))
    ]


vec = st.integers(min_value=1, max_value=24).flatmap(
    lambda n: st.tuples(
        st.lists(st.integers(0, 2), min_size=n, max_size=n),
        st.lists(st.sampled_from(["p", "li"]), min_size=n, max_size=n),
        st.lists(st.booleans(), min_size=n, max_size=n),
    )
)


@settings(max_examples=150, deadline=None)
@given(vec)
def test_vote_invariants(pv):
    preds, tags, fgs = pv
    nodes = _mk_nodes(preds, tags, fgs)
    voted = cc_majority_vote(nodes, list(preds))
    assert len(voted) == len(preds)
    for i in range(len(preds)):
        if not fgs[i]:
            assert voted[i] == preds[i]  # non-fg keeps raw
        else:
            assert voted[i] in set(preds)  # winner came from the run
    # idempotence: voting an already-voted vector is a no-op
    assert cc_majority_vote(nodes, voted) == voted


@settings(max_examples=150, deadline=None)
@given(vec, st.sampled_from([20.0, 50.0]))
def test_span_invariants(pv, med):
    preds, tags, fgs = pv
    nodes = _mk_nodes(preds, tags, fgs)
    spans = cut_spans(nodes, list(preds), ExtractSettings(), med)
    prev_end = -1
    for (s, e, m) in spans:
        assert 0 <= s <= e < len(preds)
        assert s > prev_end  # ordered, disjoint
        prev_end = e
        assert m >= 1
        # trim: endpoints are raw main fg nodes
        assert preds[s] == 1 and fgs[s]
        assert preds[e] == 1 and fgs[e]


@settings(max_examples=60, deadline=None)
@given(html_fragments)
def test_extract_deterministic(html):
    a = extract_document(html)
    b = extract_document(html)
    assert a["extracted_text"] == b["extracted_text"]
    assert a["spans"] == b["spans"]


@settings(max_examples=60, deadline=None)
@given(html_fragments)
def test_score_nodes_total(html):
    nodes = parse_html(html, max_nodes=100)
    preds, med = score_nodes(nodes)
    assert len(preds) == len(nodes)
    assert all(p in (0, 1, 2) for p in preds)
    assert med >= 0.0


# -- PDF parser properties --------------------------------------------------

from page_segmentation_spark.datagen import build_pdf  # noqa: E402
from page_segmentation_spark.pdf_parse import parse_pdf  # noqa: E402

pdf_texts = st.lists(
    st.text(
        alphabet=st.characters(min_codepoint=0x20, max_codepoint=0xFF),
        min_size=1,
        max_size=60,
    ).filter(lambda s: s.strip()),
    min_size=1,
    max_size=8,
)


@settings(max_examples=120, deadline=None)
@given(pdf_texts, st.booleans())
def test_pdf_roundtrip(texts, compress):
    """Any latin-1 text (incl. parens/backslashes) written as PDF blocks
    must parse back whitespace-normalized, in order, raw or FlateDecode."""
    blocks = [(11, t) for t in texts]
    nodes = parse_pdf(build_pdf(blocks, compress=compress))
    expected = [" ".join(t.split()) for t in texts if " ".join(t.split())]
    assert [n["text"] for n in nodes] == expected
    for i, n in enumerate(nodes):
        assert n["node_idx"] == i and n["is_fg"]
        assert n["n_chars"] == len(n["text"])


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=400))
def test_pdf_parser_never_crashes(data):
    nodes = parse_pdf(b"%PDF-1.4\n" + data)
    for n in nodes:
        assert n["n_chars"] == len(n["text"])


# reference (pre-optimization) char-class counters: the documented class
# definition, executed the slow obvious way — pins the UTF-8 byte-table
# fast path in text_stats to exact equivalence on arbitrary unicode
_UP_REF = string.ascii_uppercase + "".join(
    chr(c) for c in range(0xC0, 0xDF) if c != 0xD7
)
_LO_REF = string.ascii_lowercase + "".join(
    chr(c) for c in range(0xDF, 0x100) if c != 0xF7
)


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=80))
def test_text_stats_class_counts_match_reference(s):
    st_ = text_stats(s, 0)
    assert st_["n_punct"] == sum(c in string.punctuation for c in s)
    assert st_["n_digits"] == sum(c in string.digits for c in s)
    assert st_["n_upper"] == sum(c in _UP_REF for c in s)
    assert st_["n_alpha"] == sum(c in _UP_REF + _LO_REF for c in s)
