"""Scalar/text/dedup/similarity function library (built after core parity)."""
