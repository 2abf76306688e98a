from regnet_for_3d_grasping_tpu.models.backbone import (  # noqa: F401
    SetAbstraction,
    FeaturePropagation,
    PointNet2Seg,
)
from regnet_for_3d_grasping_tpu.models.edge import (  # noqa: F401
    EdgeSetAbstraction,
    EdgeFeaturePropagation,
)
from regnet_for_3d_grasping_tpu.models.heads import (  # noqa: F401
    TwoStageHead,
    RefineHead,
)
from regnet_for_3d_grasping_tpu.models.score_net import ScoreNet  # noqa: F401
from regnet_for_3d_grasping_tpu.models.regnet import REGNet  # noqa: F401
