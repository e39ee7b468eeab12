"""LLM-data-pipeline operators (SURVEY.md §2.11 — north-star additions).

Nothing comparable exists in the reference (Apache Hive has no dedup/ANN/
text-quality operators); these are first-class engine components for
100 TB training-data curation:

- ``dedup``         — exact, normalized, MinHash+LSH banding, n-gram
  Jaccard verification, SimHash fingerprints.
- ``similarity``    — brute-force top-k cosine (oracle baseline) +
  LSH-bucketed approximate variant (the scale path).
- ``text_analysis`` — token/char stats, quality scoring, language-ID
  heuristic, regex (BPE-ish) tokenization, document fingerprints.
- ``multimodal``    — opaque binary columns with typed metadata; decode /
  feature-extract plumbing as Arrow-batched ``mapInPandas`` (decoders
  stubbed deterministically — no image/audio libs in this environment).
"""
