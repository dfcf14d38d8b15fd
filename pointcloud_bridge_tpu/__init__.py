"""pointcloud_bridge_tpu — TPU-native (JAX/XLA/Pallas/pjit) bridge point-cloud framework.

A from-scratch, TPU-first reimplementation of the capabilities of
UT-Team-Chun/Pointcloud-bridge: semantic segmentation of bridge LiDAR scans
(PointNet, PointNet++ SSG/MSG, DGCNN, RandLA-style, BriStruNet/EnhancedPointNet2,
PointTransformerV3, superpoint-graph) plus the downstream deck width/length
measurement pipeline.

Layout (mirrors SURVEY.md layer map):
    ops/       L2  point-cloud kernels (jnp canonical + Pallas TPU kernels)
    models/    L2.5 model zoo (flax.linen, uniform apply(xyz[B,N,3], feats[B,N,C]) -> [B,N,num_classes])
    data/      L0+L1 LAS/H5 IO, block samplers, augmentation, caching
    train/     L3  training engine (optax + orbax)
    infer/     L4  block & whole-scene vote inference, metrics, LAS export
    measure/   L5  deck W/L identification (host, numpy/scipy/sklearn)
    parallel/  device mesh + sharded train/infer steps (pjit/shard_map)
    utils/     logging, metrics, profiling, checkpointing
    tools/     CLI converters (las<->h5, relabel, downsample, split)
    bench/     eva_model-style cross-model benchmark harness
"""

__version__ = "0.1.0"
