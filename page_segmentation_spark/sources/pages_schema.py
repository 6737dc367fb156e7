"""The canonical pages-table schema (BASELINE.json input_hint)."""

PAGES_DDL = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)
