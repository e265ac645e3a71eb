"""Pure-Python extraction kernel (no Spark dependency).

The kernel reimplements trafilatura's main-content extraction cascade
from scratch over a lightweight stdlib DOM; the Spark layer wraps it in
vectorized Arrow batches (see trafilatura_spark.operators.extract).
"""

from .extract import ExtractionResult, bare_extract, extract
from .settings import DEFAULT_OPTIONS, Options

__all__ = ["ExtractionResult", "bare_extract", "extract", "Options", "DEFAULT_OPTIONS"]
