"""Dataset ETL: ACDC ingest, k-fold split construction, volume slicing."""
