"""Frozen-golden regression (SURVEY §5.1): the oracle's outputs for the
seed-42 corpus are pinned; any unintended change to parser, features,
weights, vote or span semantics fails here even though the live
Spark-vs-oracle comparison would still agree (both sides move together).

Regenerate deliberately (after an intended semantics change) with:
  python -c "..."  # see tests/goldens/ generation snippet in git history
"""

import hashlib
import json
import os

from page_segmentation_spark.datagen import make_page
from page_segmentation_spark.oracle import extract_document

GOLDEN_PATH = os.path.join(
    os.path.dirname(__file__), "goldens", "extractions_seed42.json"
)


def test_oracle_matches_frozen_goldens():
    with open(GOLDEN_PATH) as f:
        gold = json.load(f)
    assert len(gold) == 34
    for url, g in gold.items():
        r = extract_document(make_page(g["doc_id"])["html"])
        sha = hashlib.sha256(r["extracted_text"].encode()).hexdigest()
        assert sha == g["text_sha256"], f"text drift for {url}"
        assert [list(s) for s in r["spans"]] == g["spans"], url
        assert r["n_nodes"] == g["n_nodes"], url
        assert r["char_med"] == g["char_med"], url
