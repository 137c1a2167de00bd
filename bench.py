"""Benchmark entry point (run by the driver on real TPU hardware).

Measures the fused depth+pose+warp TRAIN step (BASELINE.json config #4:
batch 12, DispResNet + PoseNet, multi-scale reprojection + smoothness,
640x192) in frames/sec on the default JAX device, and prints ONE JSON line:

The step runs through the multi-step scan driver (unroll optimizer steps
inside one device program, train/trainer.make_multi_step) over DISTINCT
pre-staged batches — the framework's production calling convention; each
scanned step is a complete fwd+bwd+Adam update. The defaults (pallas warp,
bf16, batch 12) are exactly configs/tpu_v5e.yaml — the shipped production
TPU config reproduces the headline number via
`cli.train --config configs/tpu_v5e.yaml --synthetic`.

  {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N}

vs_baseline is the ratio against the measured PyTorch-CPU baseline stored
in BASELINE_MEASURED.json (produced by benchmarks/torch_baseline.py on
this machine; the reference repo publishes no numbers of its own —
BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

# Per-chip peak bf16 MXU throughput (TFLOP/s), keyed by device_kind
# prefix. Public figures: v4 275, v5e ("v5 lite") 197, v5p 459,
# v6e (Trillium) 918, v3 123, v2 46.
PEAK_BF16_TFLOPS = (
    ("TPU v6", 918.0),
    ("TPU v5p", 459.0),
    ("TPU v5 lite", 197.0),
    ("TPU v5e", 197.0),
    ("TPU v4", 275.0),
    ("TPU v3", 123.0),
    ("TPU v2", 46.0),
)


def peak_tflops(device_kind: str):
    for prefix, peak in PEAK_BF16_TFLOPS:
        if device_kind.startswith(prefix):
            return peak
    return None


def step_flops(step, *args):
    """Analytic FLOPs of one compiled program from XLA's cost model.

    Must be called on a SINGLE-step program: the cost model counts a
    `lax.scan` body once regardless of trip count, so analyzing the
    unrolled multi-step program and dividing by `unroll` undercounts
    FLOPs (measured: 4x at unroll 4)."""
    cost = step.lower(*args).compile().cost_analysis()
    if isinstance(cost, (list, tuple)):  # older jax returns [dict]
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    return flops if flops > 0 else None


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=12)
    parser.add_argument("--height", type=int, default=192)
    parser.add_argument("--width", type=int, default=640)
    parser.add_argument("--steps", type=int, default=30,
                        help="outer launches to time")
    parser.add_argument("--unroll", type=int, default=8,
                        help="optimizer steps per device launch (lax.scan)")
    parser.add_argument("--warmup", type=int, default=3)
    parser.add_argument("--bf16", dest="bf16", action="store_true",
                        default=True,
                        help="bf16 model compute (fp32 params/loss) — the "
                        "production TPU configuration and the default; "
                        "measured to match fp32 convergence on the "
                        "synthetic scene (tests/test_train.py bf16 test)")
    parser.add_argument("--fp32", dest="bf16", action="store_false",
                        help="full fp32 model compute")
    parser.add_argument("--warp", default="pallas",
                        choices=("pallas", "mxu", "gather"),
                        help="photometric warp implementation")
    parser.add_argument("--col-band", type=int, default=256,
                        help="fused-warp column-window width (default 256 "
                        "= configs/tpu_v5e.yaml warp_col_band; 0 = auto: "
                        "384 at lane-aligned widths >= 512); positive "
                        "multiple of 128. Narrower = fewer warp FLOPs, "
                        "less horizontal-flow coverage")
    parser.add_argument("--depth-model", default="DispResNet",
                        help="depth net (DispResNet | DispNetS | StnDispNet)")
    parser.add_argument("--loss-mode", default="min",
                        choices=("min", "mean"),
                        help="training objective: 'min' = the production "
                        "min+automask+bidirectional objective "
                        "(configs/tpu_v5e.yaml loss_mode — the headline "
                        "must time what training ships); 'mean' = the "
                        "reference-literal REPROJECTION term (plain L1, "
                        "no SSIM, no identity pass — the r2/r3 headline "
                        "rows unknowingly timed this). NOTE: smoothing "
                        "stays the production smooth_on='disp' w=0.001 in "
                        "both modes (the reference smooths depth at w=1; "
                        "timing-equivalent, accuracy rows use "
                        "benchmarks/reference_loop.py --objective "
                        "reference for the literal objective)")
    parser.add_argument("--verbose", action="store_true")
    args = parser.parse_args(argv)
    args.steps = max(1, args.steps)
    args.unroll = max(1, args.unroll)
    if args.col_band and (args.col_band < 0 or args.col_band % 128):
        parser.error(
            f"--col-band must be 0 (auto) or a positive multiple of 128, "
            f"got {args.col_band}"
        )
    if args.col_band and args.col_band >= args.width:
        print(
            f"# --col-band {args.col_band} >= width {args.width}: the "
            "kernel runs UNBANDED (full-width dots)", file=sys.stderr,
        )

    # Persistent compile cache: first bench run on a fresh chip pays the
    # ~20-40s compile once; later runs start hot.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_bench_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # Backend init can fail transiently on the tunneled TPU (observed:
    # UNAVAILABLE during relay restarts) or HANG outright when the relay
    # is down (observed: 2026-08-17 outage — jax.devices() blocks
    # forever). Retry errors briefly, and bound each attempt with a
    # watchdog so a dead tunnel fails THIS process in minutes with a
    # clear message instead of silently eating the caller's timeout.
    import threading

    for attempt in range(3):
        probe_ok = threading.Event()
        probe_err: list = []

        def probe():
            try:
                jax.devices()
            except Exception as e:  # noqa: BLE001 — ANY init error must
                probe_err.append(e)  # surface, not read as a 180s hang
            finally:
                probe_ok.set()

        t = threading.Thread(target=probe, daemon=True)
        t.start()
        if not probe_ok.wait(timeout=180):
            print(
                "# backend init hung >180s (tunnel down?); aborting bench",
                file=sys.stderr,
            )
            os._exit(2)
        if not probe_err:
            break
        if attempt == 2:
            raise probe_err[0]
        print(f"# backend init failed ({probe_err[0]}); retrying in 30s",
              file=sys.stderr)
        time.sleep(30)

    from unsupervised_pseuso_lidar_tpu.data.synthetic import synthetic_triplet_batch
    from unsupervised_pseuso_lidar_tpu.train.config import Config
    from unsupervised_pseuso_lidar_tpu.train.trainer import (
        create_train_state,
        make_multi_step,
        make_train_step,
    )

    config = Config.from_dict(
        {
            "model": {
                "name": "bench",
                "depth": {"name": args.depth_model},
                "pose": {"name": "PoseNet"},
            },
            "datasets": {
                "augmentation": {
                    "image_width": args.width,
                    "image_height": args.height,
                },
                "sequence_length": 3,
            },
            "action": {
                "batch_size": args.batch,
                "precision": "bf16" if args.bf16 else "fp32",
            },
        }
    )
    import jax.numpy as _jnp

    dtype = _jnp.bfloat16 if args.bf16 else None
    state, depth_model, pose_model, tx = create_train_state(
        config, jax.random.PRNGKey(0), steps_per_epoch=1000, dtype=dtype
    )
    col_band = args.col_band or None
    # the full production objective from configs/tpu_v5e.yaml — the
    # headline times the step users actually train with (loss_mode 'min'
    # incl. SSIM + identity pass + bidirectional leg + depth_norm);
    # --loss-mode mean opts into the cheaper reference-literal objective
    objective = dict(
        loss_mode=args.loss_mode,
        depth_norm=args.loss_mode == "min",
        smooth_on="disp",
        smooth_weight=0.001,
    )
    if args.unroll > 1:
        step = make_multi_step(
            depth_model, pose_model, tx, args.unroll, warp_impl=args.warp,
            col_band=col_band, **objective,
        )
        raws = [
            synthetic_triplet_batch(args.batch, args.height, args.width, seed=i)
            for i in range(args.unroll)
        ]
        batch = {
            k: jax.device_put(jnp.stack([jnp.asarray(r[k]) for r in raws]))
            for k in ("tgt", "ref_imgs", "intrinsics", "oxts")
        }
    else:
        step = make_train_step(
            depth_model, pose_model, tx, warp_impl=args.warp,
            col_band=col_band, **objective,
        )
        raw = synthetic_triplet_batch(args.batch, args.height, args.width, seed=0)
        batch = {
            k: jax.device_put(jnp.asarray(v))
            for k, v in raw.items()
            if k != "groundtruth"
        }

    from unsupervised_pseuso_lidar_tpu.utils.profiling import hard_sync

    for _ in range(args.warmup):
        state, metrics = step(state, batch)
    hard_sync((state, metrics))

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = step(state, batch)
    # hard_sync, not block_until_ready: on the tunneled backend the latter
    # returns before the device finishes; only a host value readback
    # data-dependent on the final state is a true completion barrier.
    hard_sync((state, metrics))
    dt = (time.perf_counter() - t0) / (args.steps * args.unroll)
    fps = args.batch / dt

    # MFU: analytic program FLOPs (XLA cost model) at the measured rate
    # vs the chip's peak bf16 MXU throughput. Always analyzed on a
    # SINGLE-step program (see step_flops); the persistent compile cache
    # makes the extra lowering cheap when timing the unrolled path.
    device_kind = jax.devices()[0].device_kind
    if args.unroll > 1:
        step1 = make_train_step(depth_model, pose_model, tx,
                                warp_impl=args.warp, col_band=col_band,
                                donate=False, **objective)
        batch1 = {k: v[0] for k, v in batch.items()}
        flops_step = step_flops(step1, state, batch1)
    else:
        flops_step = step_flops(step, state, batch)
    # pallas_call is a custom call — opaque to the XLA cost model (0
    # FLOPs), so the fused warp kernel's MXU dots (~40% of step FLOPs at
    # the b12 config) must be added analytically or MFU undercounts.
    if flops_step and args.warp == "pallas" and (8 * args.width) % 1024 == 0:
        from unsupervised_pseuso_lidar_tpu.ops.pallas.warp import (
            fused_warp_flops,
        )

        # warp jobs per step = 3 per decoder scale (2 forward + 1
        # backward-direction), each over a full-res [B, H, W] plane
        # (losses/reprojection.py stacks them into ONE kernel call)
        depth_in = {
            "params": state.params["depth"],
            "batch_stats": state.batch_stats["depth"],
        }
        img_spec = jax.ShapeDtypeStruct(
            (1, args.height, args.width, 3), jnp.float32
        )
        disps_shape = jax.eval_shape(
            lambda v, x: depth_model.apply(v, x, train=False),
            depth_in, img_spec,
        )
        jobs = 3 * len(disps_shape) * args.batch
        # backward=True is the TOTAL differentiated-call work: the
        # VJP-forward two-tap dot; the custom-VJP backward runs no kernel
        flops_step += fused_warp_flops(
            jobs, args.height, args.width, col_band=col_band, backward=True
        )
    achieved_tflops = mfu = None
    if flops_step:
        achieved_tflops = flops_step / dt / 1e12
        peak = peak_tflops(device_kind)
        if peak:
            mfu = achieved_tflops / peak

    baseline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BASELINE_MEASURED.json"
    )
    vs_baseline = 0.0
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f)
        if baseline.get("frames_per_sec"):
            vs_baseline = fps / float(baseline["frames_per_sec"])

    if args.verbose:
        print(
            f"# device={device_kind} "
            f"sec/step={dt:.4f} loss={float(metrics['loss']):.4f}",
            file=sys.stderr,
        )
    row = {
        "metric": (
            "train_fps_depth_pose_warp_b"
            f"{args.batch}_{args.width}x{args.height}"
            + ("_bf16" if args.bf16 else "")
        ),
        "value": round(fps, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": round(vs_baseline, 3),
    }
    if achieved_tflops is not None:
        row["tflops_per_sec"] = round(achieved_tflops, 2)
    if mfu is not None:
        # fraction of peak bf16 MXU throughput (fwd+bwd+Adam program)
        row["mfu"] = round(mfu, 4)
    print(json.dumps(row))
    return fps


if __name__ == "__main__":
    main()
