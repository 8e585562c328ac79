"""Inference / evaluation harness."""

from .evaluator import Evaluator, model_name_from_path
from .export import (export_forward, load_exported, save_exported,
                     load_exported_file)

__all__ = ["Evaluator", "model_name_from_path", "export_forward",
           "load_exported", "save_exported", "load_exported_file"]
