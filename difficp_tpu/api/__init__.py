from difficp_tpu.api.icp_two_set import icp_two_set  # noqa: F401
from difficp_tpu.api.icp_atlas import icp_atlas  # noqa: F401
from difficp_tpu.api.standard_two_set import standard_two_set  # noqa: F401
from difficp_tpu.api.standard_atlas import standard_atlas  # noqa: F401
