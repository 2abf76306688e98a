from regnet_for_3d_grasping_tpu.nn.layers import (  # noqa: F401
    ConvBN,
    SharedMLP,
)
