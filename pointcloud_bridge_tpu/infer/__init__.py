"""Inference & evaluation (L4)."""

from .blocks import run_block_inference, save_metrics_csv
from .figures import save_inference_figures, file_comparison_charts, scatter_3d_comparison
from .vote import whole_scene_vote_predict
from .las_export import export_predicted_las

__all__ = [
    "run_block_inference",
    "save_inference_figures",
    "file_comparison_charts",
    "scatter_3d_comparison",
    "save_metrics_csv",
    "whole_scene_vote_predict",
    "export_predicted_las",
]
