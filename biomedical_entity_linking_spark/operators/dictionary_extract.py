"""F15: trie dictionary mention extraction over document text.

Reference: ``extract_pubmed_entities/extract_pubmed_entities.py:41-103`` —
a character trie over the alias dictionary; from every word-start index the
trie is walked and EVERY match that ends at a word boundary (next char not
alphanumeric) is emitted with its [start, end) character offsets. The
span-overlap filter (P12, ``operators/mentions.py``) is the downstream
dedup the reference applies to these spans.

Spark-first shape: the alias dictionary (alias → cui) is collected and
broadcast — it is the small build side, the same role the reference's
pickled extractor plays — and the trie is constructed ONCE PER EXECUTOR
from the broadcast list (lazy init inside the ``mapInPandas`` iterator, so
the per-task cost is a dict lookup). Documents stream through Arrow
batches; the matcher is a character automaton, which is genuinely
inexpressible in Catalyst (case (b) of the custom-operator ladder). Output
is one row per match: (doc_id, mention, cui, start, end).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

MATCH_SCHEMA = "doc_id long, mention string, cui string, start int, end int"

# alias dictionaries are small in practice (the reference pickles the same
# trie and ships it whole); this cap turns a mistaken huge build side into a
# clear error instead of a silent driver OOM
MAX_ALIAS_ROWS = 5_000_000


def _build_trie(aliases: list[tuple[str, str]]) -> dict:
    """Character trie: nested dicts; terminal nodes hold the cui under
    the reserved key '\\0' (reference TrieNode.is_end_of_word +
    entity_alias_map lookup fused — the map IS the trie terminal)."""
    root: dict = {}
    for alias, cui in aliases:
        node = root
        for ch in alias:
            node = node.setdefault(ch, {})
        node["\0"] = cui
    return root


def _extract_one(text: str, root: dict) -> list[tuple[str, str, int, int]]:
    """All word-start-anchored trie matches ending at a word boundary
    (reference ``extract_entities``: the ``text[j+1].isalnum()`` guard)."""
    out = []
    n = len(text)
    # word starts: 0 + every position following whitespace (reference :78)
    starts = [0] + [i + 1 for i, ch in enumerate(text) if ch.isspace()]
    for i in starts:
        node = root
        j = i
        while j < n:
            ch = text[j]
            nxt = node.get(ch)
            if nxt is None:
                break
            node = nxt
            j += 1
            cui = node.get("\0")
            if cui is not None:
                if j < n and text[j].isalnum():
                    continue  # not a word boundary — keep walking
                out.append((text[i:j], cui, i, j))
    return out


def extract_dictionary_mentions(
    docs: DataFrame,
    alias_to_cui: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_alias_rows: int = MAX_ALIAS_ROWS,
) -> DataFrame:
    """docs × broadcast(alias dict) → (doc_id, mention, cui, start, end).

    ``alias_to_cui``: (alias, cui) — e.g. the first cui of
    ``alias_inverted_index`` or an exploded entity table. Lowercased
    matching, mirroring the reference dictionary build.

    Size guard: the alias table is the broadcast build side; above
    ``max_alias_rows`` the collect fails with a clear message (a dictionary
    that size needs a join-based matcher, not a per-executor trie)."""
    spark = docs.sparkSession
    n_aliases = alias_to_cui.count()
    if n_aliases > max_alias_rows:
        raise ValueError(
            f"alias dictionary has {n_aliases} rows, above the broadcast-trie "
            f"cap of {max_alias_rows}; use a join-based matcher (e.g. "
            "exact_name_lut_join over tokenized spans) for dictionaries this "
            "size"
        )
    pairs = [
        (r["alias"], r["cui"])
        for r in alias_to_cui.select(
            "alias", "cui"
        ).collect()
    ]
    b_pairs = spark.sparkContext.broadcast(pairs)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        root = _build_trie(b_pairs.value)  # once per worker task chain
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                if not isinstance(text, str) or not text:
                    continue
                for mention, cui, s, e in _extract_one(text.lower(), root):
                    rows.append((int(doc_id), mention, cui, s, e))
            yield pd.DataFrame(
                rows, columns=["doc_id", "mention", "cui", "start", "end"]
            )

    return docs.select(id_col, text_col).mapInPandas(run, MATCH_SCHEMA)
