from difficp_tpu.parallel.atlas import (  # noqa: F401
    make_mesh,
    shard_psr,
    em_step_frames_sharded,
    make_atlas_train_step,
)
from difficp_tpu.parallel.ring import (  # noqa: F401
    make_ring_shoot,
    ring_rhs_self,
)
