from difficp_tpu.parallel.atlas import (  # noqa: F401
    make_mesh,
    shard_psr,
    em_step_frames_sharded,
    make_atlas_train_step,
)
from difficp_tpu.parallel.ring import (  # noqa: F401
    make_local_shoot,
    make_ring_shoot,
    ring_hamiltonian,
    ring_rhs_ext,
    ring_rhs_self,
)
from difficp_tpu.parallel.twoset import (  # noqa: F401
    make_sharded_reg_loss,
    make_twoset_step,
    shard_twoset,
)
