"""Plan inspection helpers: assert pushdown/pruning/broadcast in tests."""
