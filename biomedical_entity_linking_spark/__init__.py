"""PySpark-native record-linkage / entity-resolution engine.

A from-scratch re-expression of the query and data-processing semantics of
``davidkartchner/biomedical-entity-linking`` (studied read-only at
``/root/reference``; see ``SURVEY.md``) as an idiomatic Spark pipeline:

    pages(url, warc_ts, html, text, lang)
      -> extract (byte-identical text per url)
      -> blocking (MinHash-LSH over char-shingled titles + sorted-neighborhood
         over normalized domains)
      -> pairwise scoring (Arrow/pandas UDFs: Jaro-Winkler, token-set
         Levenshtein, cosine over pooled embeddings)
      -> transitive clustering (large-star / small-star connected components
         as DataFrame self-joins)

Everything is DataFrame/Catalyst-first; Python appears only inside
Arrow-batched pandas UDFs (never row-at-a-time).
"""

__version__ = "0.1.0"
