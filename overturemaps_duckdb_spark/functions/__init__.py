"""Scalar function kernels: geo (WKB), text, and SQL compat shims."""
