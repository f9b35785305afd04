"""Validation-only artifacts: the scalar reference-semantics oracle."""
