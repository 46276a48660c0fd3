"""Sources: deterministic synthetic web + table IO helpers."""
