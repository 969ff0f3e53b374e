from difficp_tpu.parallel.atlas import (  # noqa: F401
    make_mesh,
    shard_psr,
    em_step_frames_sharded,
    atlas_train_step,
)
