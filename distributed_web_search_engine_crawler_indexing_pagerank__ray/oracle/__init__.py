"""Single-threaded reference-semantics oracles (no Ray).

These transliterate the reference jobs' semantics (SURVEY.md §2.3–§2.6)
into slow, obviously-correct Python; the Ray Data engine is tested for
equality against them (URL-seen set, wave ordering, span sequences,
posting lists, ranks, tf-idf scores).
"""
