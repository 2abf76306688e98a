"""REGNet-TPU: a TPU-native (JAX/XLA/Pallas) framework for end-to-end 6-DoF
grasp detection in colored point clouds.

Re-designed from scratch for TPU hardware with the capabilities of the
reference REGNet (REgion-based Grasp Network, ICRA 2021): a three-stage
cascade ScoreNet -> GripperRegionNetwork -> RefineNet over 25.6k-point
RGB point clouds, plus the geometric grasp evaluator (collision + antipodal
score), data pipeline, training harness and visualization.

Design principles (vs. the CUDA/torch reference):
  * fixed shapes + validity masks everywhere (XLA-friendly), no dynamic
    index compaction;
  * all per-grasp / per-center Python loops replaced by vmap/batched ops;
  * custom CUDA kernels (FPS, ball query, grouping, 3-NN interpolation)
    replaced by lax/Pallas equivalents with native autodiff;
  * nn.DataParallel replaced by `jax.sharding.Mesh` data parallelism
    (shard_map + psum) over ICI.
"""

import os as _os

if _os.environ.get("JAX_PLATFORMS") == "cpu":
    # Some TPU plugins register themselves in a way that overrides the
    # JAX_PLATFORMS env var; honoring it here makes `JAX_PLATFORMS=cpu`
    # authoritative for every entrypoint (the CLI subprocess tests rely on
    # this — without it they would silently attach to the real accelerator
    # and contend with a concurrently running training job).
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

from regnet_for_3d_grasping_tpu.utils.config import (  # noqa: F401
    GripperConfig,
    ModelConfig,
    RegionConfig,
    EvalConfig,
    PipelineConfig,
    TrainConfig,
    train_config,
    infer_config,
)

__version__ = "0.1.0"
