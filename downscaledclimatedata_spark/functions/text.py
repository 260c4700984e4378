"""Shared cross-engine text expression fragments.

WS_RE is the whitespace class every tokenizer in the engine uses, as an
EXPLICIT character class rather than ``\\s``: Java regex ``\\s`` matches
vertical tab (``\\x0B``) but RE2's (DuckDB's) ``\\s`` does not, so any
``\\s+`` split/replace silently diverges cross-engine for text containing
``\\x0B``. The literal below parses identically in both engines (pinned
by the ``\\x0B`` row in tests/test_edge_corpus_parity.py).
"""

# Same literal text is a valid Java regex (Spark) and RE2 regex (DuckDB).
WS_RE = r"[ \t\n\r\f\x0B]+"
