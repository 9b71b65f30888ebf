from dvae_tpu.parallel.mesh import (MeshPlan, make_mesh_plan, place_state,
                                    shard_batch, shard_stacked_batch,
                                    replicate)

__all__ = ["MeshPlan", "make_mesh_plan", "place_state", "shard_batch",
           "shard_stacked_batch", "replicate"]
