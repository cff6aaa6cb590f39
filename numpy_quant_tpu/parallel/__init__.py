from .mesh import batch_sharded, make_dp_tp_mesh, make_mesh, replicated
from .pipeline import pipeline_forward, split_stages
from .sharding import (gpt_tp_rules, llama_tp_rules, param_shardings,
                       shard_model, vit_tp_rules)

__all__ = [
    "make_mesh", "make_dp_tp_mesh", "replicated", "batch_sharded",
    "param_shardings", "shard_model", "vit_tp_rules", "gpt_tp_rules",
    "llama_tp_rules", "split_stages", "pipeline_forward",
]
