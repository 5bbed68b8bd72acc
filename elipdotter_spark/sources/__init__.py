"""Corpus synthesis, table loading, index store + build ledger."""
