from dvae_tpu.parallel.mesh import (MeshPlan, make_mesh_plan, place_state,
                                    shard_batch, shard_stacked_batch,
                                    stack_batches, replicate)

__all__ = ["MeshPlan", "make_mesh_plan", "place_state", "shard_batch",
           "shard_stacked_batch", "stack_batches", "replicate"]
