"""Image->shape quality runner — the paper's headline path (VERDICT r2 #1).

Trains an image-encoder variant (``pascal_nolbo`` dual-latent NOLBO or
``kitti_inst_only`` instance-prior NOLBO) on the synthetic Pascal-style
image loader and runs the full reference evaluation protocol:

- the anytime degradation sweep at missing rates {0.3, 0.5, 0.7, 0.9},
  uncorrected vs prior-corrected, with category AND instance accuracy
  (/root/reference/src/module/nolbo.py:161-259 — the getEval the reference
  runs every training iteration, train_pascal.py:146-148);
- the PR curve with the acceptance tail at missing rate 0.3;
- protocol wall-times (the sweep is jitted end-to-end; the reference's
  eager host-RNG protocol cannot batch this way).

The synthetic stand-in (SyntheticImageObjectLoader) renders each procedural
shape to a silhouette at a random azimuth — the Pascal3DSingleObjectLoader
batch contract (pascal3D.py:277-283) without a dataset. For
``kitti_inst_only`` the loader's 10 CLASSES play the reference's 10 CAD car
models (train_kitti.py:52): geometric prototypes distinguishable from an
image, classified against the INSTANCE prior (nolbo.py:443-474, correction
mode 'mean').

Usage:
  python benchmarks/quality_image.py --config pascal_nolbo --steps 8000 \
      --out docs/results/pascal_nolbo.json
  python benchmarks/quality_image.py --config kitti_inst_only --steps 8000 \
      --out docs/results/kitti_inst_only.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True,
                   help="pascal_nolbo | kitti_inst_only | pascal_category | "
                        "pascal_vae | pascal_ae")
    p.add_argument("--steps", type=int, default=8000)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--learning-rate", type=float, default=1e-4)
    p.add_argument("--train-samples", type=int, default=4096)
    p.add_argument("--eval-samples", type=int, default=1024)
    p.add_argument("--eval-image-size", type=int, default=64)
    p.add_argument("--multi-scale", default="64,96",
                   help="comma list of square train sizes (reference "
                        "multi-scale schedule, train_pascal.py:121-124); "
                        "one size disables the schedule. A 'size:batch' "
                        "entry overrides the batch for that bucket — the "
                        "reference shrinks batch as resolution grows "
                        "(train_pascal.py:50-67), e.g. '224:16,320:8,448:4'")
    p.add_argument("--fp32", action="store_true")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--out", required=True)
    p.add_argument("--jsonl", default=None)
    p.add_argument("--eval-batches", type=int, default=16)
    p.add_argument("--inst-spread", type=float, default=0.4,
                   help="per-instance extent spread of the synthetic loader; "
                        "0.4 makes instance identity recoverable from one "
                        "silhouette (distinct CADs differ structurally)")
    p.add_argument("--structural-inst", action="store_true",
                   help="part-based procedural CAD instance curriculum "
                        "(data/instances.py) — instance identity is shape, "
                        "not scale (r4; r3 measured the scale-only ceiling)")
    p.add_argument("--load-params", default=None,
                   help="Orbax params dir to warm-start from (continue a "
                        "prior --save-params run; optimizer state starts "
                        "fresh)")
    p.add_argument("--save-params", default=None,
                   help="Orbax path to save the trained params (before the "
                        "pace probe donates the state) — lets downstream "
                        "evals (benchmarks/streaming_fusion.py) reuse the "
                        "run instead of retraining")
    p.add_argument("--correction", default=None,
                   help="override the correction mode (resample | mean | "
                        "resample_gated | mean_gated); _gated corrects only "
                        "confident nearest-prior decisions (anytime/engine.py)")
    args = p.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from anytime3d_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache("/tmp/anytime3d_jax_cache")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from anytime3d_tpu.anytime import anytime_eval_jit
    from anytime3d_tpu.data.modelnet import SyntheticImageObjectLoader
    from anytime3d_tpu.data.packing import (
        pack_voxels,
        pack_voxels_blocked,
        unpack_voxels,
    )
    from anytime3d_tpu.evaluation import evaluate_epoch, missing_rate_sweep, pr_curve
    from anytime3d_tpu.models import configs
    from anytime3d_tpu.models.mmvae import MultiModalVAE
    from anytime3d_tpu.train import create_train_state
    from anytime3d_tpu.train.trainer import Trainer, TrainerConfig, multi_scale_schedule

    model_cfg, loss_cfg = configs.variant(args.config)
    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    model = MultiModalVAE(model_cfg, dtype=dtype)
    kitti = model_cfg.category_dim == 0 and model_cfg.prior_inst is not None
    # pascal: 12 categories x 10 instances. kitti: the loader's 10 classes
    # stand in for the 10 CAD models, classified via the instance prior.
    n_cls = 10 if kitti else (model_cfg.category_dim or 12)
    n_inst = model_cfg.inst_dim or 10
    dim = model_cfg.decoder.output_shape[0]

    train_ld = SyntheticImageObjectLoader(
        num_samples=args.train_samples, dim=dim, num_classes=n_cls,
        num_inst=n_inst, seed=0, inst_spread=args.inst_spread,
        structural_inst=args.structural_inst,
    )
    eval_ld = SyntheticImageObjectLoader(
        num_samples=args.eval_samples, dim=dim, num_classes=n_cls,
        num_inst=n_inst, seed=1, inst_spread=args.inst_spread,
        structural_inst=args.structural_inst,
    )

    sizes, schedule = [], []
    for entry in args.multi_scale.split(","):
        s, _, b = entry.partition(":")
        s, b = int(s), int(b) if b else args.batch_size
        sizes.append(s)
        schedule.append((s, s, b))

    def label_keys(inst, cls):
        out = {}
        if kitti:
            # the synthetic CLASS prototype is the CAD instance label
            out["inst_onehot"] = jnp.asarray(cls)
        else:
            if model_cfg.prior_category is not None or model_cfg.category_dim:
                out["category_onehot"] = jnp.asarray(cls)
            if model_cfg.inst_dim:
                out["inst_onehot"] = jnp.asarray(inst)
        return out

    def train_batch_fn(it):
        rows, _cols, bs = multi_scale_schedule(schedule, it)
        inst, cls, _sin, _cos, images, vox = train_ld.getNextBatch(
            bs, imageSize=(rows, rows)
        )
        # uint8 images + bit-packed targets: the axon tunnel is ~54 MB/s, so
        # transfer size IS the step pace; normalization happens inside jit
        # (train/step.py::materialize_batch)
        batch = {
            "input": jnp.asarray((images * 255).astype(np.uint8)),
            "target_packed_blocked": jnp.asarray(pack_voxels_blocked(vox)),
        }
        batch.update(label_keys(inst, cls))
        return batch

    # ---- fixed eval batches (dense on device, built once)
    es = args.eval_image_size
    unpack = jax.jit(lambda pk: unpack_voxels(pk, (dim, dim, dim, 1)))
    eval_batches = []
    for _ in range(args.eval_batches):
        inst, cls, _sin, _cos, images, vox = eval_ld.getNextBatch(
            args.batch_size, imageSize=(es, es)
        )
        b = {
            "input": jnp.asarray(images.astype(np.float32)),
            "target": unpack(jnp.asarray(pack_voxels(vox))),
        }
        b.update(label_keys(inst, cls))
        if kitti:
            # the engine reports nearest-prior classification as
            # acc_category; for instOnly that IS instance accuracy
            b["category_onehot"] = b["inst_onehot"]
        eval_batches.append(b)

    def eval_batch_fn(i):
        return eval_batches[i % len(eval_batches)]

    state = create_train_state(
        model,
        jnp.zeros((args.batch_size, es, es, 3), dtype),
        jax.random.PRNGKey(0),
        learning_rate=args.learning_rate,
    )
    if args.load_params:
        from anytime3d_tpu.train.checkpoint import restore_params

        state = state.replace(params=jax.device_put(restore_params(
            args.load_params, jax.device_get(state.params)
        )))
        print("warm-started params from", args.load_params)
    trainer = Trainer(
        model,
        state,
        train_batch_fn,
        loss_config=loss_cfg,
        config=TrainerConfig(
            total_steps=args.steps, log_every=200, eval_every=0,
            jsonl_path=args.jsonl,
        ),
    )
    t0 = time.time()
    final_state = trainer.run(epoch_fn=lambda: train_ld.epoch)
    train_s = time.time() - t0
    params = final_state.params
    if args.save_params:
        from anytime3d_tpu.train.checkpoint import save_params as _save_params

        # host copy first: the pace probe below DONATES final_state's buffers
        _save_params(args.save_params, jax.device_get(params))
        print("saved params to", args.save_params)
    final_train = {k: round(v, 5) for k, v in trainer.logger.means().items()}
    print(f"\ntrained {args.steps} steps in {train_s:.1f}s; final:", final_train)

    # ---- prior anchors. kitti_inst_only has no category priornet: anchors
    # are the instance-prior means over the 10 CAD one-hots (nolbo.py:443-455)
    prior_means = None
    correction = args.correction or "resample"
    if kitti:
        eye = jnp.eye(model_cfg.prior_inst.input_dim, dtype=jnp.float32)
        prior_means, _ = model.apply(
            {"params": params}, eye, method=MultiModalVAE.priors_inst
        )
        # instOnly snaps to the prior mean (nolbo.py:460-474); an explicit
        # --correction (e.g. mean_gated) still overrides
        correction = args.correction or "mean"

    # ---- full-observation eval + the anytime degradation sweep (timed)
    t_eval = time.time()
    eval_full = evaluate_epoch(
        model, params, eval_batch_fn, num_batches=args.eval_batches,
        missing_prob=0.0, prior_means=prior_means, correction=correction,
    )
    eval_full_s = time.time() - t_eval
    t_sweep = time.time()
    sweep = missing_rate_sweep(
        model, params, eval_batch_fn, rates=(0.3, 0.5, 0.7, 0.9),
        num_batches=args.eval_batches, prior_means=prior_means,
        correction=correction,
    )
    sweep_s = time.time() - t_sweep

    # ---- PR curve with acceptance tail at missing 0.3
    preds, preds_c, targets = [], [], []
    for i in range(min(8, args.eval_batches)):
        b = eval_batch_fn(i)
        m = anytime_eval_jit(
            model, params, b, jax.random.PRNGKey(7000 + i),
            missing_prob=0.3, prior_means=prior_means, correction=correction,
            return_pred=True,
        )
        preds.append(np.asarray(m["pred"], np.float32))
        preds_c.append(np.asarray(m["pred_corrected"], np.float32))
        targets.append(np.asarray(b["target"], np.float32))
    target = jnp.asarray(np.concatenate(targets))
    thresholds = [(i + 1) / 20 for i in range(19)]
    curve = pr_curve(target, jnp.asarray(np.concatenate(preds)),
                     thresholds=thresholds, acceptance_div=10)
    curve_c = pr_curve(target, jnp.asarray(np.concatenate(preds_c)),
                       thresholds=thresholds, acceptance_div=10)

    # ---- per-bucket pace probe (r4, VERDICT missing #4: reference-scale
    # multi-scale training): device-resident step time vs transfer-inclusive
    # end-to-end time per compiled bucket. The TRAIN loop's overall
    # ms/step (train_seconds/steps) shows what the background prefetcher
    # hides of the e2e-vs-device gap. Runs LAST: steps donate final_state.
    from anytime3d_tpu.train import make_train_step as _mts

    probe_step = _mts(model, loss_cfg, donate=True)  # same jit as the trainer
    pace = {}
    s2, key = final_state, jax.random.PRNGKey(99)

    def bucket_batch(rows, bs):
        inst, cls, _s, _c2, images, vox = train_ld.getNextBatch(
            bs, imageSize=(rows, rows)
        )
        b = {
            "input": jnp.asarray((images * 255).astype(np.uint8)),
            "target_packed_blocked": jnp.asarray(pack_voxels_blocked(vox)),
        }
        b.update(label_keys(inst, cls))
        return b

    for rows, _c, bs in schedule:
        bt = bucket_batch(rows, bs)
        for _ in range(3):
            s2, m = probe_step(s2, bt, key)
        float(m["loss_total"])
        t0p, iters = time.time(), 10
        for _ in range(iters):
            s2, m = probe_step(s2, bt, key)
        float(m["loss_total"])
        dev_ms = (time.time() - t0p) / iters * 1e3
        t0p, e2e_iters = time.time(), 5
        for _ in range(e2e_iters):
            s2, m = probe_step(s2, bucket_batch(rows, bs), key)
            float(m["loss_total"])
        e2e_ms = (time.time() - t0p) / e2e_iters * 1e3
        pace[f"{rows}x{rows}xB{bs}"] = {
            "device_ms_per_step": round(dev_ms, 2),
            "e2e_unprefetched_ms_per_step": round(e2e_ms, 2),
        }
    print("bucket pace:", pace)

    result = {
        "config": args.config,
        "family": "image->shape",
        "steps": args.steps,
        "batch_size": args.batch_size,
        "multi_scale": sizes,
        "eval_image_size": es,
        "dim": dim,
        "dtype": "float32" if args.fp32 else "bfloat16",
        "train_seconds": round(train_s, 1),
        "train_ms_per_step": round(train_s / max(args.steps, 1) * 1e3, 2),
        "bucket_pace": pace,
        "train_samples": args.train_samples,
        "eval_samples": args.eval_samples,
        "inst_spread": args.inst_spread,
        "structural_inst": args.structural_inst,
        "correction_mode": correction,
        "final_train": final_train,
        "eval_full": {k: round(float(v), 5) for k, v in eval_full.items()},
        "protocol_seconds": {
            "eval_full": round(eval_full_s, 2),
            "sweep_4rates": round(sweep_s, 2),
        },
        "sweep": {
            str(r): {k: round(float(v), 5) for k, v in m.items()}
            for r, m in sweep.items()
        },
        "pr_curve_missing03": {k: v.tolist() for k, v in curve.items()},
        "pr_curve_missing03_corrected": {k: v.tolist() for k, v in curve_c.items()},
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print("wrote", args.out)
    acc_key = "acc_category"
    for r in ("0.3", "0.5", "0.7", "0.9"):
        m = result["sweep"][r]
        line = f"rate {r}: P {m['precision']:.3f} R {m['recall']:.3f}"
        if "precision_corrected" in m:
            line += (f" | corrected P {m['precision_corrected']:.3f} "
                     f"R {m['recall_corrected']:.3f}")
        if acc_key in m:
            line += f" | acc {m[acc_key]:.3f}"
            if acc_key + "_corrected" in m:
                line += f" -> {m[acc_key + '_corrected']:.3f}"
        if "acc_inst" in m:
            line += f" | inst {m['acc_inst']:.3f}"
        print(line)


if __name__ == "__main__":
    main()
