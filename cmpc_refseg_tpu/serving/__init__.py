"""Inference/serving export."""
