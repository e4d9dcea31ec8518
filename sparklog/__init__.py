"""sparklog — a PySpark-native RFC 5424 log parse→enrich→route→aggregate
engine, built from scratch with the query/data-processing capabilities of
the reference Rust parser (Roguelazer/rust-syslog-rfc5424, SURVEY.md).
"""

__version__ = "0.1.0"
