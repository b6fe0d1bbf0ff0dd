from mgldvsr_tpu.ops.resize import resize2d
from mgldvsr_tpu.ops.warp import flow_warp, resize_flow
from mgldvsr_tpu.ops.occlusion import forward_backward_consistency_check
