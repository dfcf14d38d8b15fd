"""Device-mesh parallelism (SURVEY.md §2.9).

The reference is single-GPU; here data parallelism is first-class: a 1-D
`data` mesh over ICI, batch sharded on axis 0, parameters/optimizer state
replicated, gradients pmean'd, and BatchNorm statistics synchronized across
the mesh via axis_name (SURVEY.md §7 hard part #4). Models are small (<8M
params) so tensor sharding is unnecessary for parity; `sharding.py` adds
the GSPMD headroom path: a 2-axis (data, model) mesh with column-parallel
Dense kernels, expressed purely as sharding annotations (XLA places the
collectives). `ring.py`/`sp.py` add sequence parallelism: the N point axis
sharded over the mesh with PTv3 global attention as ring attention.
"""

from .mesh import make_mesh, make_named_mesh, shard_batch, replicate
from .train_step import (
    make_dp_train_step,
    make_dp_multi_train_step,
    make_dp_eval_step,
)
from .sharding import (
    make_2d_mesh,
    make_tp_train_step,
    param_shardings,
    state_shardings,
)
from .ring import ring_attention
from .ep import make_ep_mesh, make_ep_train_step, ep_state_shardings
from .fsdp import fsdp_state_shardings, make_fsdp_mesh, make_fsdp_train_step
from .sp import (
    make_sp_eval_step,
    make_sp_forward,
    make_sp_train_step,
    make_sp_multi_train_step,
)
from .pp import (
    make_pp_eval_step,
    make_pp_forward,
    make_pp_state,
    make_pp_train_step,
    pp_place_state,
    pp_stack_state,
    pp_state_specs,
    pp_unstack_state,
    stack_ptv3_params,
    unstack_ptv3_params,
)

__all__ = [
    "ring_attention",
    "make_ep_mesh",
    "make_ep_train_step",
    "ep_state_shardings",
    "make_fsdp_mesh",
    "make_fsdp_train_step",
    "fsdp_state_shardings",
    "make_pp_eval_step",
    "make_pp_forward",
    "make_pp_state",
    "make_pp_train_step",
    "pp_place_state",
    "pp_stack_state",
    "pp_state_specs",
    "pp_unstack_state",
    "stack_ptv3_params",
    "unstack_ptv3_params",
    "make_sp_eval_step",
    "make_sp_forward",
    "make_sp_train_step",
    "make_sp_multi_train_step",
    "make_mesh",
    "make_named_mesh",
    "shard_batch",
    "replicate",
    "make_dp_train_step",
    "make_dp_multi_train_step",
    "make_dp_eval_step",
    "make_2d_mesh",
    "make_tp_train_step",
    "param_shardings",
    "state_shardings",
]
