"""Fast diagnostic sweep for the reference-loop head-to-head.

VERDICT r3 item 1: on benchmarks/reference_loop.py's scene, this
framework's held-out predictions landed at the constant-prediction floor
(REFLOOP.json "ours" == floor to 4 decimals) under BOTH the production and
the reference-literal objective, while the reference's torch trainer
learned (abs_rel 0.1754). This harness isolates why: it preloads the
whole synthetic tree into device memory (the 1-core host's PNG decoding
dominated the 0.95 s/step of the original run) and drives the REAL jitted
train step (train.trainer.make_train_step) over knob combinations —
objective, precision, warp impl, lr, init — with periodic held-out evals
scored by the same routine reference_loop uses.

Usage:
  python benchmarks/diag_refloop.py --runs prod_bf16 ref_f32 ...
Assumes the tree exists (python benchmarks/reference_loop.py tree).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from benchmarks.reference_loop import _depth_metrics  # noqa: E402

# default tree location (reference_loop.py defaults); --root/--workdir
# point the harness at an independently rendered tree (e.g. the
# multiobject scene) without racing a concurrently running suite
WORKDIR = "/tmp/refloop_work"
ROOT = "/tmp/refloop_kitt"


def _base_config(overrides):
    from unsupervised_pseuso_lidar_tpu.train.config import Config

    action = {
        "mode": "train",
        "MLOps": False,
        "log_freq": 100,
        "from_scratch": True,
        "split": [1.0, 0.0],
        "random_seed": 42,
        "batch_size": 4,
        "num_epochs": 25,
        "num_workers": 0,
        "optimizer": {"name": "Adam", "depth": {"lr": 1e-4},
                      "pose": {"lr": 1e-4}},
        "scheduler": {"name": "StepLR", "step_size": 10000, "gamma": 1.0},
    }
    action.update(overrides)
    return Config.from_dict({
        "model": {
            "name": "diag",
            "depth": {"name": "DispResNet"},
            "pose": {"name": "PoseNet"},
        },
        "datasets": {
            "path": ROOT,
            "split": os.path.join(WORKDIR, "train_split.txt"),
            "augmentation": {"image_width": 416, "image_height": 128,
                             "shuffle": True},
            "sequence_length": 3,
            "dataset": ["KITTI"],
        },
        "action": action,
    })


def _load_all(config, split):
    """Load every sample of a split eagerly (64 triplets — trivial)."""
    from unsupervised_pseuso_lidar_tpu.data.kitti import (
        UnSupKittiDataset, collate,
    )

    cfg = _base_config({})
    cfg.datasets.split = os.path.join(WORKDIR, f"{split}_split.txt")
    ds = UnSupKittiDataset(cfg)
    items = [ds.load_sample(i, with_groundtruth=True) for i in range(len(ds))]
    return collate(items)


RUNS = {
    # reproduce the r3 production run (bf16 + pallas, min+automask)
    "prod_bf16": {"loss_mode": "min", "depth_norm": True,
                  "smooth_on": "disp", "smooth_weight": 0.001,
                  "warp_impl": "pallas", "precision": "bf16"},
    # production objective at full precision, exact warp
    "prod_f32": {"loss_mode": "min", "depth_norm": True,
                 "smooth_on": "disp", "smooth_weight": 0.001,
                 "warp_impl": "gather", "precision": "fp32"},
    # the reference's literal objective at full precision, exact warp
    "ref_f32": {"loss_mode": "mean", "depth_norm": False,
                "smooth_on": "depth", "smooth_weight": 1.0,
                "warp_impl": "gather", "precision": "fp32"},
    # reference objective + the production execution settings
    "ref_bf16": {"loss_mode": "mean", "depth_norm": False,
                 "smooth_on": "depth", "smooth_weight": 1.0,
                 "warp_impl": "pallas", "precision": "bf16"},
    # production objective without depth_norm
    "prod_f32_nonorm": {"loss_mode": "min", "depth_norm": False,
                        "smooth_on": "disp", "smooth_weight": 0.001,
                        "warp_impl": "gather", "precision": "fp32"},
    # mean-mode + depth_norm + disp smoothness (the 'learning evidence'
    # config from benchmarks/run_all.py)
    "mean_norm_f32": {"loss_mode": "mean", "depth_norm": True,
                      "smooth_on": "disp", "smooth_weight": 0.001,
                      "warp_impl": "gather", "precision": "fp32"},
    # production objective + automask warmup ramp (the r4 knob whose
    # ship/no-ship decision r5 settles by measurement, VERDICT item 4)
    "prod_bf16_warmup300": {"loss_mode": "min", "depth_norm": True,
                            "smooth_on": "disp", "smooth_weight": 0.001,
                            "warp_impl": "pallas", "precision": "bf16",
                            "automask_warmup": 300},
}


def run_one(name, steps, eval_every, seed=42, lr=None, extra=None):
    import jax
    import jax.numpy as jnp

    from unsupervised_pseuso_lidar_tpu.train.trainer import (
        create_train_state, forward_batch, make_train_step,
    )
    from unsupervised_pseuso_lidar_tpu.geometry.warp import disp_to_depth

    overrides = dict(RUNS[name])
    if lr:
        overrides["optimizer"] = {"name": "Adam", "depth": {"lr": lr},
                                  "pose": {"lr": lr}}
    if extra:
        overrides.update(extra)
    overrides.setdefault("random_seed", seed)
    config = _base_config(overrides)
    dtype = jnp.bfloat16 if config.action.precision == "bf16" else None

    train = _load_all(config, "train")
    evald = _load_all(config, "eval")
    n = train["tgt"].shape[0]
    bsz = config.action.batch_size
    steps_per_epoch = n // bsz

    rng = jax.random.PRNGKey(config.action.random_seed)
    state, depth_model, pose_model, tx = create_train_state(
        config, rng, steps_per_epoch, dtype=dtype
    )
    step_fn = make_train_step(
        depth_model, pose_model, tx,
        loss_mode=config.action.loss_mode,
        smooth_weight=config.action.smooth_weight,
        smooth_on=config.action.smooth_on,
        depth_norm=config.action.depth_norm,
        automask_warmup=config.action.automask_warmup,
        no_ssim=config.action.no_ssim,
        warp_impl=config.action.warp_impl,
        col_band=None,
    )

    dev_train = {
        "tgt": jnp.asarray(train["tgt"]),
        "ref_imgs": jnp.asarray(train["ref_imgs"]),
        "intrinsics": jnp.asarray(train["intrinsics"]),
        "oxts": jnp.asarray(train["oxts"]),
    }
    fwd = jax.jit(
        lambda p, bs, b: forward_batch(
            depth_model, pose_model, p, bs, b, train=False
        )[0][0]
    )

    def evaluate(state):
        preds = []
        m = evald["tgt"].shape[0]
        for i in range(0, m, bsz):
            sl = slice(i, min(i + bsz, m))
            batch = {
                "tgt": jnp.asarray(evald["tgt"][sl]),
                "ref_imgs": jnp.asarray(evald["ref_imgs"][sl]),
                "intrinsics": jnp.asarray(evald["intrinsics"][sl]),
                "oxts": jnp.asarray(evald["oxts"][sl]),
            }
            disp0 = fwd(state.params, state.batch_stats, batch)
            depth = disp_to_depth(disp0.astype(jnp.float32))
            preds.append(np.asarray(depth, dtype=np.float32)[..., 0])
        preds = np.concatenate(preds, axis=0)
        return _depth_metrics(preds, evald["groundtruth"]), preds

    host_rng = np.random.default_rng(seed)
    order = host_rng.permutation(n)
    pos = 0
    history = []
    t0 = time.perf_counter()
    for step in range(steps):
        if pos + bsz > n:
            order = host_rng.permutation(n)
            pos = 0
        idx = jnp.asarray(order[pos : pos + bsz])
        pos += bsz
        batch = {k: v[idx] if k != "intrinsics" else v[idx]
                 for k, v in dev_train.items()}
        state, metrics = step_fn(state, batch)
        if (step + 1) % eval_every == 0 or step == 0:
            m = {k: float(v) for k, v in metrics.items()
                 if np.ndim(v) == 0}
            ev, preds = evaluate(state)
            # disparity statistics of the last eval predictions (depth
            # back to sigma: sigma = (1/depth - 0.01)/10)
            inv = 1.0 / np.maximum(preds, 1e-6)
            sig = (inv - 0.01) / 10.0
            row = {
                "step": step + 1,
                "loss": m.get("loss"),
                "reproj": m.get("mul_app_loss"),
                "smooth": m.get("smoothness_loss"),
                "eval": ev,
                "sigma_mean": round(float(sig.mean()), 4),
                "sigma_std": round(float(sig.std()), 4),
                "pred_depth_mean": round(float(preds.mean()), 3),
                "pred_depth_std": round(float(preds.std()), 4),
            }
            history.append(row)
            print(f"[{name}] step {row['step']:4d} loss={row['loss']:.4f} "
                  f"abs_rel={ev['abs_rel']:.4f} a1={ev['a1']:.4f} "
                  f"sig_mean={row['sigma_mean']:.3f} "
                  f"sig_std={row['sigma_std']:.4f}", flush=True)
    secs = time.perf_counter() - t0
    return {"name": name, "overrides": overrides, "steps": steps,
            "train_seconds": round(secs, 1), "history": history}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", nargs="+", default=["prod_bf16", "ref_f32"])
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--eval-every", type=int, default=50)
    ap.add_argument("--lr", type=float, default=0.0)
    ap.add_argument("--out", default="/tmp/diag_refloop.json")
    ap.add_argument("--root", default="")
    ap.add_argument("--workdir", default="")
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    if args.root:
        globals()["ROOT"] = args.root
    if args.workdir:
        globals()["WORKDIR"] = args.workdir
    results = []
    for name in args.runs:
        results.append(run_one(name, args.steps, args.eval_every,
                               seed=args.seed, lr=args.lr or None))
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
