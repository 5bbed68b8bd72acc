"""elipdotter_spark — a PySpark-native full-text inverted-index + BM25 query engine.

A brand-new distributed engine with the query/data-processing capabilities of
the Rust reference engine Icelk/elipdotter (v0.3.5, /root/reference), re-expressed
Spark-first:

- ``core``       pure-Python reference semantics (tokenizer, parser, similarity,
                 scoring kernel).  Used both as the rank-identity oracle in tests
                 and as the per-document scoring kernel inside Arrow-batched
                 grouped UDFs (the per-doc pipeline is inherently sequential;
                 the document dimension is the distributed axis).
- ``functions``  vectorized Arrow/pandas UDFs + column expression helpers.
- ``operators``  index build / merge / boolean retrieval / scoring / BM25 /
                 dedup / ANN / text analysis operators (DataFrame-first).
- ``sources``    corpus synthesis, table loading, the parquet-backed index store
                 and the per-partition build ledger (resumability).
- ``plans``      query AST -> DataFrame plan compiler.
- ``streaming``  incremental index maintenance via Structured Streaming.
"""

__version__ = "0.1.0"
