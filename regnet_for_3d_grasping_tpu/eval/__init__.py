from regnet_for_3d_grasping_tpu.eval.normals import estimate_normals  # noqa: F401
from regnet_for_3d_grasping_tpu.eval.collision import (  # noqa: F401
    check_grasps_scene,
    check_grasps_view,
)
from regnet_for_3d_grasping_tpu.eval.evaluator import (  # noqa: F401
    eval_test,
    eval_validate,
    EvalRecord,
)
