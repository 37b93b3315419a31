"""resume_ocr_spark — a PySpark-native document-extraction engine.

Brand-new engine with the query/data-processing capabilities of the
reference (tomlavez/resume-ocr, a FastAPI resume OCR+analysis service),
re-expressed Spark-first: one Iceberg-layout table of interleaved
text+media documents flows through vectorized Arrow batch UDFs
(PDF parse / OCR / HTML boilerplate strip), then pure Column ops for
section/field extraction, scoring and top-k ranking.

See SURVEY.md for the operator inventory and file:line citations into
the reference.
"""

__version__ = "0.1.0"
