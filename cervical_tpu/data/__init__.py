"""Datasets, feature builders, splits, and input pipelines."""
