"""Reusable column-expression builders (text, vectors, multimodal).

Each helper returns BOTH a Spark ``Column`` and (where applicable) the
mirrored DuckDB SQL fragment, built from the same constants, so the
driver's differential oracle can't drift from the Spark implementation.
"""
