"""Cross-model benchmark harness (eva_model.py equivalent, SURVEY.md §3.5)."""

from .eva_model import evaluate_model, run_benchmark, save_results_csv

__all__ = ["evaluate_model", "run_benchmark", "save_results_csv"]
