"""Pure-Python reference semantics: the rank-identity referee and per-doc kernels."""
