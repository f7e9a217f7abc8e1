"""Corpus sources: deterministic synthetic code corpus (FIXTURES.md §3)
and adapters from the driver testdata tables to the engine's input
shape."""
