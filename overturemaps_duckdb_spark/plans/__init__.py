"""Logical-plan layer: the pipeline-DSL → DataFrame compiler."""
