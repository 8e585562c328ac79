"""Inference / evaluation harness."""

from .evaluator import Evaluator, model_name_from_path

__all__ = ["Evaluator", "model_name_from_path"]
