from .mesh import (batch_sharding, make_mesh, replicate, replicated_sharding,
                   shard_batch)
from .spatial import (check_spatial_eligible, receptive_halo,
                      spatial_forward, spatial_forward_multiscale)
