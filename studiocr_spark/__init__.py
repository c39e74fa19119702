"""studiocr_spark — a PySpark-native rebuild of StudiOCR's capabilities.

A from-scratch batch extraction engine over Common-Crawl-style page tables:
rasterize embedded page images / multi-page containers from the ``html``
binary column, run a pluggable OCR decode inside Arrow-vectorized pandas
UDFs, emit word-level bounding-box block rows + typed per-page statistics,
build a Spark SQL inverted index, and serve the reference's two search
surfaces (global keyword search, in-document span search) as DataFrame
queries.

Reference: whimbree/StudiOCR (see SURVEY.md). This package re-expresses the
reference's *computational contract* (OCR page data → block rows → page
aggregates → search results) Spark-first; it is not a port.
"""

__version__ = "0.1.0"
