"""Device mesh + sharding helpers (the ICI-collective analog of the
reference's NCCL/DDP layer, SURVEY.md §2.4)."""

from .mesh import make_mesh, process_shard, replicate, shard_batch  # noqa: F401
from .pp import (  # noqa: F401
    make_pp_mesh,
    make_pp_vit_apply,
    shard_pp_params,
    stack_block_params,
    unstack_block_params,
)
from .tp import (  # noqa: F401
    make_tp_mesh,
    make_tp_train_step,
    shard_train_state,
    tp_param_specs,
)
