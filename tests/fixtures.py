"""Golden corpus re-export (canonical copy: elipdotter_spark/sources/golden.py)."""

from elipdotter_spark.sources.golden import (  # noqa: F401
    AN1_CORPUS,
    AN1_DOC1,
    AN1_DOC3,
    DOC1,
    DOC2,
    LOREM_CORPUS,
    SV_CORPUS,
    SV_DOC1,
    SV_DOC2,
    SV_DOC3,
    SV_DOC4,
    SV_DOC5,
)
