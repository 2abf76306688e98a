"""Training CLI — the reference's ``train.py`` modes on a TPU mesh.

Modes (train.py:25-26): train, pretrain_score, pretrain_region,
validate[_score|_region], test[_score|_region].

Usage:
  python -m regnet_for_3d_grasping_tpu.cli.train --mode pretrain_score \
      --data-path /data --model-path ./models --tag run0
"""

from __future__ import annotations

import argparse
import os
import re
import time

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="REGNet-TPU training")
    p.add_argument("--tag", type=str, default="default")
    p.add_argument("--mode", required=True, choices=[
        "train", "pretrain_score", "pretrain_region", "validate",
        "validate_score", "validate_region", "test", "test_score",
        "test_region"])
    p.add_argument("--epoch", type=int, default=101)
    p.add_argument("--batch-size", type=int, default=12)
    p.add_argument("--data-path", type=str, required=True)
    p.add_argument("--model-path", type=str, default="./assets/models")
    p.add_argument("--log-path", type=str, default="./assets/log")
    p.add_argument("--lr-score", type=float, default=1e-3)
    p.add_argument("--lr-region", type=float, default=1e-3)
    p.add_argument("--lr-step-epochs", type=int, default=5,
                   help="StepLR period (reference: 5; it decays the LR to "
                        "~1e-6 by epoch 50 — raise for longer runs)")
    p.add_argument("--lr-gamma", type=float, default=0.5)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--center-jitter", type=str, default="",
                   help="comma list of center_num values cycled across "
                        "train steps (e.g. '64,256,1024') — exposes the "
                        "refine classifier to inference-scale proposal "
                        "distributions; one compiled step per value")
    p.add_argument("--eval-center-num", type=int, default=0,
                   help="run validation-epoch forwards at this center_num "
                        "(e.g. 4000 = the inference preset) instead of the "
                        "training value, to measure calibration drift")
    p.add_argument("--load-score-path", type=str, default="",
                   help="checkpoint tag dir (or .../ckpt_N) whose "
                        "pretrained ScoreNet weights initialize this run "
                        "(reference --load-score-path, utils.py:59-78)")
    p.add_argument("--load-region-path", type=str, default="",
                   help="checkpoint tag dir (or .../ckpt_N) whose "
                        "GRN/RefineNet weights initialize this run "
                        "(reference --load-region-path, utils.py:80-115; "
                        "like the reference, optimizer state starts "
                        "fresh — pair with --resume to also restore the "
                        "epoch counter from this run's own tag)")
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest checkpoint under "
                        "model-path/tag")
    p.add_argument("--synthetic-scenes", type=int, default=0,
                   help="generate N synthetic scenes under data-path "
                        "first (no real dataset available)")
    p.add_argument("--gt-robust", type=int, default=0,
                   help="pose-robust GT labeling: candidates must also "
                        "survive N jittered poses (sigma 6mm/0.12rad, "
                        ">=75%% pass) — kills table-skimming side "
                        "grasps that do not transfer to real sensor "
                        "clouds (data/synthetic._validate_grasps_robust)")
    p.add_argument("--scene-layout", type=str, default="origin",
                   choices=["origin", "randomized"],
                   help="synthetic scene layout distribution "
                        "(data/synthetic.py): 'origin' = r1-r4 canonical "
                        "table at z=0.75 centered on the origin; "
                        "'randomized' = per-scene table height/extent/"
                        "offset/yaw, real table-point fractions, floors "
                        "and ungraspable distractors — the measured "
                        "layout stats of the reference's committed real "
                        "and virtual clouds (tools/probe_layout.py)")
    p.add_argument("--eval-grasps", action="store_true",
                   help="run the geometric VGR evaluator during "
                        "validation epochs (slower)")
    p.add_argument("--eval-every", type=int, default=1,
                   help="run the grasp evaluator only every K validation "
                        "epochs (the loss-metric validation still runs "
                        "every epoch)")
    p.add_argument("--num-points", type=int, default=25600)
    p.add_argument("--tiny", action="store_true",
                   help="tiny model/shapes (smoke tests)")
    p.add_argument("--native-loader", action="store_true",
                   help="use the C++ threaded batch loader "
                        "(data/native_loader.py)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize backbone activations in backward "
                        "(fits larger per-chip batches)")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 network compute for the TRAIN steps "
                        "(params and optimizer state stay f32; validation "
                        "forwards stay f32 so quality comparisons are "
                        "apples-to-apples)")
    p.add_argument("--slab-cell", type=float, default=0.0,
                   help="sorted-slab geometry kernels in the TRAIN "
                        "forward (region.slab_cell, 0.04 = the A/B'd "
                        "serving setting; validation forwards stay exact). "
                        "Quality-gate like the serving config — frozen "
                        "suite + holdout")
    p.add_argument("--fps-groups", type=int, default=1,
                   help="stratified approximate FPS in the TRAIN forward "
                        "(model.fps_groups; validation forwards stay "
                        "exact)")
    p.add_argument("--geom-aug", type=float, default=0.0,
                   help="geometric training augmentation severity "
                        "(data/augment.py): Kinect sensor noise on the "
                        "view cloud + one global z-rotation and xyz "
                        "translation per scene (view and GT frames move "
                        "together). 0 = off; 1.0 = published Kinect v1 "
                        "noise magnitudes, 10%% dropout, full rotation, "
                        "cm-scale translation. Counters the noiseless "
                        "exact-z=0.75 synthetic distribution "
                        "(docs/evidence/real_data_r4_retrained.json)")
    p.add_argument("--profile-dir", type=str, default="",
                   help="capture a jax.profiler trace of steps 3-8 of the "
                        "first epoch (replaces the reference's ad-hoc "
                        "time.time() prints, train.py:372-382)")
    return p


def merge_checkpoint_subtrees(state, path, keys):
    """Initialize the named top-level param/batch_stats subtrees from
    another run's checkpoint — the reference's partial construct_net
    loads (--load-score-path / --load-region-path, utils.py:59-115;
    a region checkpoint may predate the refine heads, so missing
    subtrees are simply kept at their fresh init, like the reference's
    state_dict merge at utils.py:81-88).  Optimizer state stays fresh;
    the reference never saves it either.

    `path` is a checkpoint tag dir (latest epoch) or `.../ckpt_N`.
    """
    from regnet_for_3d_grasping_tpu.utils import checkpoint as ckpt

    base = path.rstrip("/")
    epoch = None
    m = re.fullmatch(r"ckpt_(\d+)", os.path.basename(base))
    if m:
        epoch, base = int(m.group(1)), os.path.dirname(base)
    restored, from_ep = ckpt.restore_checkpoint(
        base, epoch=epoch, target=state._asdict())
    params = dict(state.params)
    bstats = dict(state.batch_stats)
    for k in keys:
        if k in restored["params"]:
            params[k] = restored["params"][k]
        if k in restored["batch_stats"]:
            bstats[k] = restored["batch_stats"][k]
    print(f"loaded {keys} from {base} (epoch {from_ep - 1})")
    return state._replace(params=params, batch_stats=bstats)


MODE_STAGE = {
    "train": "refine", "validate": "refine", "test": "refine",
    "pretrain_score": "score", "validate_score": "score",
    "test_score": "score",
    "pretrain_region": "region", "validate_region": "region",
    "test_region": "region",
}


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax

    from regnet_for_3d_grasping_tpu.utils.cache import (
        enable_compilation_cache)
    enable_compilation_cache()

    from regnet_for_3d_grasping_tpu.data import (
        GraspDataset, load_scene, write_synthetic_dataset)
    from regnet_for_3d_grasping_tpu.models import REGNet
    from regnet_for_3d_grasping_tpu.parallel import make_mesh, shard_batch
    from regnet_for_3d_grasping_tpu.train import trainer
    from regnet_for_3d_grasping_tpu.utils import checkpoint as ckpt
    from regnet_for_3d_grasping_tpu.utils.config import train_config
    from regnet_for_3d_grasping_tpu.utils.export import extract_grasp_sets
    from regnet_for_3d_grasping_tpu.utils.logging import MetricLogger
    from regnet_for_3d_grasping_tpu.eval.evaluator import (
        EvalRecord, evaluate_scene_grasps, view_num_from_path)

    if args.tiny:
        from regnet_for_3d_grasping_tpu.utils.config import tiny_config
        cfg = tiny_config(**{
            "train.batch_size": args.batch_size,
            "train.lr_score": args.lr_score,
            "train.lr_region": args.lr_region,
            "train.lr_step_epochs": args.lr_step_epochs,
            "train.lr_gamma": args.lr_gamma,
        })
        args.num_points = cfg.region.num_points
    else:
        cfg = train_config(**{
            "region.num_points": args.num_points,
            "train.batch_size": args.batch_size,
            "train.lr_score": args.lr_score,
            "train.lr_region": args.lr_region,
            "train.lr_step_epochs": args.lr_step_epochs,
            "train.lr_gamma": args.lr_gamma,
        })
    import dataclasses
    if args.remat:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, remat_backbone=True))
    # fast-training knobs apply to the TRAIN config only; `exact_cfg`
    # below (validation forwards) keeps exact geometry + f32 compute
    exact_cfg = cfg
    if args.slab_cell > 0.0:
        cfg = dataclasses.replace(
            cfg, region=dataclasses.replace(cfg.region,
                                            slab_cell=args.slab_cell))
    if args.fps_groups > 1:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model,
                                           fps_groups=args.fps_groups))
    train_dtype = None
    if args.bf16:
        import jax.numpy as _jnp
        train_dtype = _jnp.bfloat16

    if args.synthetic_scenes:
        write_synthetic_dataset(args.data_path, args.synthetic_scenes,
                                num_view=args.num_points,
                                layout=args.scene_layout,
                                gt_robust=args.gt_robust)
    stage = MODE_STAGE[args.mode]
    is_train = args.mode in ("train", "pretrain_score", "pretrain_region")

    logger = MetricLogger(args.log_path, args.tag)
    ckpt_dir = os.path.join(args.model_path, args.tag)

    train_ds = GraspDataset(args.data_path, "train", args.num_points,
                            cfg.region.max_gt_grasps, args.seed)
    val_tag = "test" if "test" in args.mode else "validate"
    val_ds = GraspDataset(args.data_path, val_tag, args.num_points,
                          cfg.region.max_gt_grasps, args.seed)
    batch_size = args.batch_size if is_train else 1
    steps_per_epoch = max(len(train_ds) // max(batch_size, 1), 1)

    model = REGNet(cfg, dtype=train_dtype)
    devices = jax.devices()
    mesh = make_mesh(devices) if (is_train and len(devices) > 1
                                  and batch_size % len(devices) == 0) \
        else None
    if mesh is not None:
        print(f"data-parallel over {len(devices)} devices")

    sample = next((train_ds if len(train_ds) else val_ds).batches(
        batch_size, seed=0))
    dsample = trainer.device_batch(sample)

    resume_epoch = 0
    optimizer = trainer.make_optimizer(cfg, steps_per_epoch)
    state = trainer.init_state(model, cfg, optimizer, dsample.pc,
                               args.seed)
    if args.resume and ckpt.latest_epoch(ckpt_dir) is not None:
        restored, resume_epoch = ckpt.restore_checkpoint(
            ckpt_dir, target=state._asdict())
        optimizer = trainer.make_optimizer(cfg, steps_per_epoch,
                                           resume_epoch)
        state = trainer.TrainState(**restored)
        print(f"resumed from epoch {resume_epoch - 1}")

    if args.load_score_path:
        state = merge_checkpoint_subtrees(state, args.load_score_path,
                                          ["score_net"])
    if args.load_region_path:
        state = merge_checkpoint_subtrees(state, args.load_region_path,
                                          ["grn_head", "refine_head"])

    import dataclasses as _dc

    def _with_center_num(base_cfg, nc):
        return _dc.replace(
            base_cfg, region=_dc.replace(base_cfg.region, center_num=nc))

    if args.center_jitter:
        jitter = [int(v) for v in args.center_jitter.split(",") if v]
        cfgs = [_with_center_num(cfg, v) for v in jitter]
        train_steps = [
            trainer.make_train_step(REGNet(c, dtype=train_dtype),
                                    optimizer, c, stage, mesh)
            for c in cfgs]
        print(f"center_num jitter over {jitter}")
    else:
        train_steps = [trainer.make_train_step(model, optimizer, cfg,
                                               stage, mesh)]

    # validation forwards: exact geometry, f32 compute (exact_cfg) —
    # the fast-training knobs never touch the quality measurements
    if args.eval_center_num:
        eval_cfg = _with_center_num(exact_cfg, args.eval_center_num)
        print(f"validation forwards at center_num={args.eval_center_num}")
    else:
        eval_cfg = exact_cfg
    eval_step = trainer.make_eval_step(REGNet(eval_cfg), eval_cfg, stage)

    # geometric eval parallelism: one scene per device (VERDICT r2 #4 —
    # previously the per-scene collision checks ran host-sequentially
    # while the other devices idled; eval/parallel_eval.py applies the
    # DP-serving pattern to them)
    eval_mesh = make_mesh(devices) if len(devices) > 1 else None
    if eval_mesh is not None:
        from regnet_for_3d_grasping_tpu.eval.parallel_eval import (
            evaluate_scenes_sharded)

    def run_eval_epoch(epoch, mode_name, ds, with_grasps=True):
        records = {"stage2": EvalRecord(), "stage3_class": EvalRecord(),
                   "stage3_score": EvalRecord()}
        pending = {name: [] for name in records}   # (scene, grasps, ...)

        def flush(stage_name):
            items = pending[stage_name]
            if not items:
                return
            pending[stage_name] = []
            g = cfg.gripper
            for w in sorted({it[4] for it in items}):   # group by width
                sel = [it for it in items if it[4] == w]
                recs = evaluate_scenes_sharded(
                    eval_mesh, [it[0] for it in sel],
                    [it[1] for it in sel], [it[2] for it in sel],
                    [it[5] for it in sel], [it[3] for it in sel], w, g,
                    cfg.eval)
                for r in recs:
                    records[stage_name] = records[stage_name].add(r)

        n = 0
        for batch in ds.batches(1, seed=epoch, shuffle=False,
                                augment=False):
            dbatch = trainer.device_batch(batch)
            key = jax.random.PRNGKey(epoch * 10007 + n)
            out, metrics = eval_step(state, dbatch, key)
            logger.scalars(metrics, n + epoch * len(ds), mode_name,
                           "batch")
            if args.eval_grasps and with_grasps and stage != "score":
                sets = extract_grasp_sets(out)[0]
                data = load_scene(batch.paths[0])
                try:
                    view = view_num_from_path(batch.paths[0])
                except ValueError:
                    view = 0
                g = cfg.gripper
                for stage_name, grasps in (
                        ("stage2", sets["grasp_stage2"]),
                        ("stage3_class", sets["grasp_stage3"]),
                        ("stage3_score", sets["grasp_stage3_score"])):
                    if len(grasps) == 0:
                        continue
                    # per-grasp [G] depths (reference map_param_dict path,
                    # utils.py:261-268,293); constant here but exercises
                    # the array plumbing end-to-end
                    depths = np.full(len(grasps), g.depth, np.float32)
                    # randomized-layout scenes carry their own table z
                    # (data/synthetic.py layout kwarg)
                    tz = float(data.get("table_height", g.table_height))
                    if eval_mesh is None:
                        rec = evaluate_scene_grasps(
                            data, grasps, view, tz, depths,
                            float(batch.width[0]), g, cfg.eval)
                        records[stage_name] = records[stage_name].add(rec)
                    else:
                        pending[stage_name].append(
                            (data, grasps, view, depths,
                             float(batch.width[0]), tz))
                        if len(pending[stage_name]) >= \
                                eval_mesh.devices.size:
                            flush(stage_name)
            n += 1
        for stage_name in records:
            if eval_mesh is not None:
                flush(stage_name)
        for stage_name, rec in records.items():
            if rec.formal > 0:
                logger.scalar(f"epoch_{mode_name}_{stage_name}_vgr",
                              rec.vgr, epoch)
                logger.scalar(f"epoch_{mode_name}_{stage_name}_score",
                              rec.score, epoch)
                logger.scalar(
                    f"epoch_{mode_name}_{stage_name}_vgr_before",
                    rec.vgr_before, epoch)
                print(f"[{mode_name} {epoch}] {stage_name}: "
                      f"vgr={rec.vgr:.3f} score={rec.score:.3f}")

    if not is_train:
        run_eval_epoch(resume_epoch, args.mode, val_ds)
        return

    native = None
    if args.native_loader:
        from regnet_for_3d_grasping_tpu.data.native_loader import (
            NativeLoader, convert_dataset)
        cache = os.path.join(args.data_path, "rsc_cache")
        rsc = convert_dataset(train_ds.paths, cache)
        native = NativeLoader(
            rsc, batch_size, args.num_points, cfg.region.max_gt_grasps,
            seed=args.seed)
        print(f"native loader over {len(rsc)} cached scenes")

    def maybe_geom_aug(batch, geom_rng):
        if not args.geom_aug:
            return batch
        from regnet_for_3d_grasping_tpu.data.augment import augment_batch
        from regnet_for_3d_grasping_tpu.eval.evaluator import CAMERA_POSE
        cams = np.stack([CAMERA_POSE[view_num_from_path(pp)]
                         for pp in batch.paths])
        return augment_batch(batch, geom_rng, args.geom_aug, cams)

    def epoch_batches(epoch):
        # per-epoch RNG: a --resume run replays the same augmentation
        # stream as an uninterrupted run from the same seed
        geom_rng = np.random.RandomState(args.seed + 7919 + epoch)
        if native is not None:
            for _ in range(steps_per_epoch):
                yield maybe_geom_aug(native.next_batch(), geom_rng)
        else:
            for b in train_ds.batches(batch_size, seed=epoch):
                yield maybe_geom_aug(b, geom_rng)

    profiling = False
    for epoch in range(resume_epoch, args.epoch):
        t0 = time.time()
        total = 0.0
        nb = 0
        for batch in epoch_batches(epoch):
            if args.profile_dir and epoch == resume_epoch:
                if nb == 3 and not profiling:
                    jax.profiler.start_trace(args.profile_dir)
                    profiling = True
                elif nb == 8 and profiling:
                    jax.block_until_ready(state)
                    jax.profiler.stop_trace()
                    profiling = False
                    print(f"profiler trace written to {args.profile_dir}")
            dbatch = trainer.device_batch(batch)
            if mesh is not None:
                dbatch = shard_batch(dbatch, mesh)
            key = jax.random.PRNGKey(epoch * 131071 + nb)
            step_fn = train_steps[(epoch * steps_per_epoch + nb)
                                  % len(train_steps)]
            state, metrics = step_fn(state, dbatch, key)
            logger.scalars(metrics, nb + epoch * steps_per_epoch,
                           "train", "batch")
            total += float(metrics["loss_total"])
            nb += 1
            print(f"train epoch {epoch} [{nb}/{steps_per_epoch}] "
                  f"loss {float(metrics['loss_total']):.4f}")
        if profiling:
            jax.block_until_ready(state)
            jax.profiler.stop_trace()
            profiling = False
        logger.scalar("epoch_train_loss", total / max(nb, 1), epoch)
        print(f"epoch {epoch}: mean loss {total / max(nb, 1):.4f} "
              f"({time.time() - t0:.1f}s)")
        ckpt.save_checkpoint(ckpt_dir, epoch, state._asdict())
        run_eval_epoch(epoch, "validate", val_ds,
                       with_grasps=(epoch % max(args.eval_every, 1) == 0
                                    or epoch == args.epoch - 1))


if __name__ == "__main__":
    main()
