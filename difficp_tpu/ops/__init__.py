from difficp_tpu.ops import reductions  # noqa: F401
