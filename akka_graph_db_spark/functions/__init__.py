"""LLM-data-pipeline operators (SURVEY.md §2.9; north-star extension).

Everything here is JVM-side DataFrame expressions unless a Pandas UDF is
genuinely required (only the multimodal decode path); no row-at-a-time
Python UDFs anywhere.

Modules:

- ``dedup``      — exact, MinHash-LSH, SimHash, n-gram-Jaccard, and
                   embedding-cosine near-duplicate detection
- ``similarity`` — brute-force and LSH-bucketed cosine top-k search
- ``text``       — tokenization, quality stats, language-ID heuristic,
                   document fingerprinting
- ``multimodal`` — opaque binary payload columns + Arrow-batched metadata
                   extraction (decode stubs clearly marked)
- ``events``     — tumbling/sliding/session windows over the event stream
"""
