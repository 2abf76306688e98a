from regnet_for_3d_grasping_tpu.vis.vis_grasp import (  # noqa: F401
    gripper_hand_boxes,
    show_grasp,
    write_ply,
)
