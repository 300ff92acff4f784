"""Operator library — each module maps a SURVEY §2 family to Spark.

- ``reshape``    R1/R2/R3 unpivot / pivot / separate
- ``filters``    F1-F6 with R-compatible NULL semantics
- ``metrics``    A3/A4/A5 grouped time-series metrics (agg + window)
- ``joins``      J1-J3 plus as-of / range joins
- ``dedup``      exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding
- ``similarity`` brute-force + LSH-bucketed cosine ANN
- ``text``       lang-id, quality scoring, token counts, fingerprints
- ``multimodal`` binary-column plumbing (decode stubbed)
"""
