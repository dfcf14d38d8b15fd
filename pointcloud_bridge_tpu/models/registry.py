"""Model registry: name -> constructor, mirroring the reference's model zoo
(SURVEY.md §2.2) and eva_model.py's model table (eva_model.py:463-527)."""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict

import flax.linen as nn

from .pointnet2 import PointNet2SSG, PointNet2MSG
from .pointnet import PointNetSeg, PointNetGlobalSeg, PointNetSemSegPartsize
from .dgcnn import DGCNN, DGCNNGlobal
from .randlanet import RandLANet, RandLANetSS
from .ptv3 import PointTransformerV3
from .ptv3_pooled import PointTransformerV3Pooled
from .bristrunet import BriStruNet
from .spg import SuperpointGraph
from .spt import SPTSegmenter
from .enhanced_pointnet2 import EnhancedPointNet2SSG
from .cls_models import (
    PointNet2ClsSSG,
    PointNet2ClsMSG,
    PointNetCls,
    PointNet2SSGPartsize,
)

MODEL_REGISTRY: Dict[str, Callable[..., nn.Module]] = {
    "pointnet2": PointNet2SSG,  # reference name for the SSG seg model
    "pointnet2_ssg": PointNet2SSG,
    "pointnet2_msg": PointNet2MSG,  # Partsize 9-channel MSG
    "pointnet": PointNetSeg,  # eva_model's 'PointNet' (pointnet.py:59-173)
    "pointnet_seg": PointNetSeg,
    "pointnet_global": PointNetGlobalSeg,  # model.py:301-369 variant
    "dgcnn": DGCNN,
    "dgcnn_global": DGCNNGlobal,  # model.py:372-482 benchmark-CSV variant
    "randlanet": RandLANet,
    "randlanet_ss": RandLANetSS,
    "ptv3": PointTransformerV3,
    "bristrunet": BriStruNet,  # EnhancedPointNet2 / BridgeSeg (paper model)
    "enhanced_pointnet2": BriStruNet,
    "bridgeseg": BriStruNet,
    "pointnet_cls": PointNetCls,
    "pointnet2_cls_ssg": PointNet2ClsSSG,
    "pointnet2_cls_msg": PointNet2ClsMSG,
    "pointnet2_sem_seg": PointNet2SSGPartsize,  # Partsize 9-ch SSG seg
    "pointnet_sem_seg": PointNetSemSegPartsize,  # Partsize 9-ch PointNet seg
    "spg": SuperpointGraph,
    "superpoint_graph": SuperpointGraph,
    "spt": SPTSegmenter,  # point-level SuperPointTransformer wrapper
    "superpoint_transformer": SPTSegmenter,
    # beyond reference: MoE-FFN PTv3 (models/moe.py) — the expert-parallel
    # scaling target (parallel/ep.py); every other block routes to 8 experts
    "ptv3_moe": partial(PointTransformerV3, num_experts=8),
    # beyond reference: true-PTv3 hierarchical U-Net (serialized grid
    # pooling/unpooling + windowed attention per level, models/ptv3_pooled.py)
    "ptv3_pooled": PointTransformerV3Pooled,
    "enhanced_pointnet2_ssg": EnhancedPointNet2SSG,  # older SSG+EPE variant
}


def register_model(name: str):
    def deco(cls):
        MODEL_REGISTRY[name] = cls
        return cls

    return deco


def get_model(name: str, num_classes: int, **kwargs) -> nn.Module:
    try:
        ctor = MODEL_REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown model '{name}'; available: {sorted(MODEL_REGISTRY)}"
        ) from None
    return ctor(num_classes=num_classes, **kwargs)
