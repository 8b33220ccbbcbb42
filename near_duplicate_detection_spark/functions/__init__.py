"""Scalar / vectorized functions: hashing, text extraction, signatures."""
