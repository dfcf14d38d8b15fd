"""Device-mesh parallelism (SURVEY.md §2.9).

The reference is single-GPU; here data parallelism is first-class: a 1-D
`data` mesh over ICI, batch sharded on axis 0, parameters/optimizer state
replicated, gradients pmean'd, and BatchNorm statistics synchronized across
the mesh via axis_name (SURVEY.md §7 hard part #4). Models are small (<8M
params) so tensor sharding is unnecessary; the same shard_map scaffolding
accepts extra mesh axes for headroom.
"""

from .mesh import make_mesh, shard_batch, replicate
from .train_step import make_dp_train_step, make_dp_eval_step

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "make_dp_train_step",
    "make_dp_eval_step",
]
