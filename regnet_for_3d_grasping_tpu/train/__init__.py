from regnet_for_3d_grasping_tpu.train.losses import (  # noqa: F401
    regnet_losses,
    score_loss,
    stage2_losses,
    stage3_losses,
)
