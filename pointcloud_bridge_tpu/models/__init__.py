"""Model zoo (L2.5). All segmentation models share one convention:

    logits = model.apply(variables, xyz, features, train=...)   # [B, N, num_classes]

with xyz [B, N, 3] and features [B, N, C] (channel-last everywhere), unlike
the reference's tolerated [B,C,N]/[B,N,C] ambiguity (SURVEY.md §2.2).
"""

from .registry import get_model, MODEL_REGISTRY

__all__ = ["get_model", "MODEL_REGISTRY"]
