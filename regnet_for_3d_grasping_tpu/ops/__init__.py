"""TPU-native point-cloud op library.

JAX/XLA equivalents of every custom CUDA op in the reference's
``multi_model/utils/pn2_utils/csrc`` extension (``csrc/main.cpp:6-14``):

  farthest_point_sample  -> fps.farthest_point_sample   (lax.scan masked-argmax)
  ball_query             -> ball_query.ball_query       (chunked masked top-k)
  group_points (+bwd)    -> grouping.group_points       (take_along_axis; XLA AD)
  point_search (3-NN)    -> knn.three_nn                (chunked top-k)
  interpolate (+bwd)     -> knn.three_interpolate       (weighted gather; XLA AD)
  gather_points          -> grouping.gather_points
  gather_knn (+bwd)      -> grouping.group_points       (same op, dgcnn_ext)

Unlike the CUDA backward kernels, gradients here come from XLA autodiff and
its *deterministic* scatter-adds (the reference's atomicAdd backwards are
nondeterministic).
"""

from regnet_for_3d_grasping_tpu.ops.fps import farthest_point_sample
from regnet_for_3d_grasping_tpu.ops.ball_query import ball_query
from regnet_for_3d_grasping_tpu.ops.grouping import (
    gather_points,
    group_points,
)
from regnet_for_3d_grasping_tpu.ops.pooling import gather_max
from regnet_for_3d_grasping_tpu.ops.knn import three_nn, three_interpolate
from regnet_for_3d_grasping_tpu.ops.distances import bpdist, bpdist2, pdist2
from regnet_for_3d_grasping_tpu.ops.sampling import (
    bucket_choice,
    masked_random_choice,
)

__all__ = [
    "farthest_point_sample",
    "ball_query",
    "gather_max",
    "gather_points",
    "group_points",
    "three_nn",
    "three_interpolate",
    "bpdist",
    "bpdist2",
    "pdist2",
    "bucket_choice",
    "masked_random_choice",
]
