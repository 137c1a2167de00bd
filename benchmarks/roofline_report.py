"""Per-op roofline accounting of the headline train step (VERDICT r2 #2).

docs/PERFORMANCE.md §2 closed the 52 ms budget with family-level
estimates ("convs ~35 ms" etc.). This script replaces the prose with a
measured per-op table:

  1. compile the single-step headline program (b12 640x192 bf16, fused
     Pallas warp — exactly `bench.py` / configs/tpu_v5e.yaml);
  2. parse every `convolution` instruction out of the optimized HLO
     (`compiled.as_text()`), including convs inside fusion computations,
     with its shapes / window / dim_labels → analytic FLOPs + HBM bytes
     → per-op roofline ms on this chip (max of MXU-limit and HBM-limit);
  3. capture a profiler trace (utils/trace.op_breakdown machinery,
     collapse=False → per-HLO-instruction device ms) and attribute each
     executed instruction's measured time to the conv(s) it hosts;
  4. emit benchmarks/ROOFLINE.json + a markdown table (measured ms vs
     roofline ms vs efficiency, per conv family and for the Pallas warp
     custom call), so "each conv family is at / near its XLA ceiling"
     is a table, not an assertion.

Run on the TPU host:  python benchmarks/roofline_report.py
(CPU fallback works but the roofline constants are TPU-only, so rows
are marked backend=cpu and efficiencies are meaningless there.)
"""

from __future__ import annotations

import argparse
import collections
import json
import math
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DTYPE_BYTES = {"bf16": 2, "f32": 4, "f16": 2, "s32": 4, "u8": 1, "pred": 1}

# v5e ("TPU v5 lite") public peaks; bench.py keys the same table.
PEAK_BF16_TFLOPS = 197.0
PEAK_F32_TFLOPS = 49.25  # MXU is bf16; fp32 convs run ~1/4 rate
HBM_GBPS = 819.0

SHAPE_RE = re.compile(r"(bf16|f32|f16|s32|u8|pred)\[([\d,]*)\]")


def parse_shape(text: str):
    """First 'dtype[d0,d1,...]' in text -> (dtype, [dims])."""
    m = SHAPE_RE.search(text)
    if not m:
        return None, []
    dims = [int(d) for d in m.group(2).split(",") if d] or [1]
    return m.group(1), dims


def parse_convs(hlo: str):
    """Every convolution instruction in the optimized HLO.

    Returns [{name, comp, out_dtype, out_dims, operand_shapes, window,
    dim_labels, flops, bytes}], plus {comp_name: fusion_instr_name} so a
    conv inside a fused computation maps to the instruction the profiler
    actually times.
    """
    # Pass 1: output shape of every instruction, plus fusion-computation
    # parameter shapes — operand shapes are NOT printed at the call site
    # ("convolution(%a, %b)"), so convs resolve them by name here.
    shapes = {}  # (comp, instr_name) -> (dtype, dims)
    comp_of_fusion = {}
    comp = "ENTRY"
    for raw in hlo.splitlines():
        line = raw.strip()
        m = re.match(r"(?:ENTRY )?%?([\w.\-]+)\s*\((.*)\)\s*->.*{", line)
        if m and "=" not in line.split("(")[0]:
            comp = m.group(1)
            # header params: "param_0.1: bf16[12,96,320,64], p2: f32[...]"
            for mp in re.finditer(
                r"([\w.\-]+):\s*(bf16|f32|f16|s32|u8|pred)\[([\d,]*)\]",
                m.group(2),
            ):
                dims = [int(d) for d in mp.group(3).split(",") if d] or [1]
                shapes[(comp, mp.group(1))] = (mp.group(2), dims)
            continue
        if line == "}":
            comp = "ENTRY"
            continue
        minstr = re.match(r"%?([\w.\-]+)\s*=\s*(.*)", line)
        if minstr:
            dt, dims = parse_shape(minstr.group(2))
            if dt is not None:
                shapes[(comp, minstr.group(1))] = (dt, dims)
        mcall = re.search(r"%?([\w.\-]+)\s*=.*\bfusion\(.*calls=%?([\w.\-]+)", line)
        if mcall:
            comp_of_fusion[mcall.group(2)] = mcall.group(1)

    # Pass 2: the convolutions, operands resolved through `shapes`.
    convs = []
    comp = "ENTRY"
    for raw in hlo.splitlines():
        line = raw.strip()
        m = re.match(r"(?:ENTRY )?%?([\w.\-]+)\s*\([^)]*\)\s*->.*{", line)
        if m and "=" not in line.split("(")[0]:
            comp = m.group(1)
            continue
        if line == "}":
            comp = "ENTRY"
            continue
        if " convolution(" not in line:
            continue
        mname = re.match(r"%?([\w.\-]+)\s*=\s*(.*)", line)
        if not mname:
            continue
        name = mname.group(1)
        out_dtype, out_dims = parse_shape(mname.group(2))
        # operand NAMES inside convolution(...); shapes looked up by name
        args_txt = line.split(" convolution(", 1)[1]
        args_txt = args_txt.split("), window=")[0].split(")")[0]
        operand_shapes = []
        for op_name in (a.strip().lstrip("%") for a in args_txt.split(",")):
            got = shapes.get((comp, op_name))
            if got is not None:
                operand_shapes.append(got)
        mw = re.search(r"window={([^}]*)}", line)
        window = mw.group(1) if mw else ""
        ml = re.search(r"dim_labels=([\w>\-]+)", line)
        dim_labels = ml.group(1) if ml else ""
        msz = re.search(r"size=([\dx]+)", window)
        win_prod = 1
        if msz:
            for d in msz.group(1).split("x"):
                win_prod *= int(d)
        # contracted input-feature dim: position of 'i' in the rhs labels
        rhs_i = 1
        if dim_labels and len(operand_shapes) >= 2:
            parts = dim_labels.split("->")[0].split("_")
            if len(parts) == 2 and "i" in parts[1]:
                rhs_i = operand_shapes[1][1][parts[1].index("i")]
        out_elems = math.prod(out_dims)
        flops = 2.0 * out_elems * win_prod * rhs_i
        byt = DTYPE_BYTES.get(out_dtype, 4) * out_elems + sum(
            DTYPE_BYTES.get(dt, 4) * math.prod(dd) for dt, dd in operand_shapes
        )
        # 128-lane padding model: the MXU contracts 128 lanes and emits
        # 128 lanes; a conv with cin or cout < 128 burns the same cycles
        # as the padded shape. This is the LAYOUT ceiling small-channel
        # convs actually face (XLA can partially recover by folding
        # batch/spatial into sublanes, so treat it as a bound, not truth).
        out_labels = dim_labels.split("->")[-1] if dim_labels else ""
        if "f" in out_labels:
            co = out_dims[out_labels.index("f")]
        else:
            co = out_dims[-1] if out_dims else 1
        pad = lambda n: 128 * math.ceil(max(n, 1) / 128)
        flops_padded = flops * (pad(rhs_i) / max(rhs_i, 1)) * (pad(co) / max(co, 1))
        convs.append(
            {
                "name": name,
                "comp": comp,
                "out": f"{out_dtype}{out_dims}",
                "operands": [f"{dt}{dd}" for dt, dd in operand_shapes],
                "window": window,
                "dim_labels": dim_labels,
                "gflops": flops / 1e9,
                "gflops_padded": flops_padded / 1e9,
                "mbytes": byt / 1e6,
                "dtype": out_dtype,
            }
        )
    return convs, comp_of_fusion


def conv_family(c):
    """Stable human label: role + window + feature dims."""
    win = re.search(r"size=([\dx]+)", c["window"])
    win = win.group(1) if win else "?"
    role = "fwd"
    if "lhs_dilate" in c["window"]:
        role = "grad_in"  # (or stride-2 transposed-conv fwd)
    labels = c["dim_labels"]
    if labels:
        out_part = labels.split("->")[-1]
        # filter gradients produce a kernel-shaped output: no batch dim
        # in the output labels' leading position (e.g. ...->01bf / ...->01io)
        if out_part and out_part[0] not in "b":
            role = "grad_filter"
    rhs = c["operands"][1] if len(c["operands"]) > 1 else "?"
    rhs_dims = rhs.split("[")[-1].rstrip("]")
    last = (rhs_dims.split(",")[-1] if "," in rhs_dims else rhs_dims).strip()
    return f"{role}_{win}_co{last}"


def roofline_ms(c, padded: bool = False):
    peak = PEAK_BF16_TFLOPS if c["dtype"] == "bf16" else PEAK_F32_TFLOPS
    gf = c["gflops_padded"] if padded else c["gflops"]
    t_flops = gf / peak / 1e3  # s
    t_mem = c["mbytes"] / 1e3 / HBM_GBPS
    return max(t_flops, t_mem) * 1e3


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=12)
    parser.add_argument("--height", type=int, default=192)
    parser.add_argument("--width", type=int, default=640)
    parser.add_argument("--steps", type=int, default=10)
    parser.add_argument("--warp", default="pallas")
    # production defaults = bench.py / configs/tpu_v5e.yaml (the r4 report
    # accidentally profiled the cheaper 'mean' objective at auto col_band,
    # which is why its totals disagreed with the bench headline)
    parser.add_argument("--col-band", type=int, default=256)
    parser.add_argument("--loss-mode", default="min",
                        choices=("min", "mean"))
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_bench_cache"),
    )

    from unsupervised_pseuso_lidar_tpu.data.synthetic import synthetic_triplet_batch
    from unsupervised_pseuso_lidar_tpu.train.config import Config
    from unsupervised_pseuso_lidar_tpu.train.trainer import (
        create_train_state,
        make_train_step,
    )
    from unsupervised_pseuso_lidar_tpu.utils.trace import (
        op_breakdown,
        summarize_xplane,
    )

    config = Config.from_dict(
        {
            "model": {
                "name": "roofline",
                "depth": {"name": "DispResNet"},
                "pose": {"name": "PoseNet"},
            },
            "datasets": {
                "augmentation": {
                    "image_width": args.width,
                    "image_height": args.height,
                },
            },
            "action": {"batch_size": args.batch, "precision": "bf16"},
        }
    )
    state, depth_model, pose_model, tx = create_train_state(
        config, jax.random.PRNGKey(0), 1000, dtype=jnp.bfloat16
    )
    objective = dict(
        loss_mode=args.loss_mode,
        depth_norm=args.loss_mode == "min",
        smooth_on="disp",
        smooth_weight=0.001,
    )
    step = make_train_step(
        depth_model, pose_model, tx, warp_impl=args.warp,
        col_band=args.col_band or None, donate=False, **objective,
    )
    raw = synthetic_triplet_batch(args.batch, args.height, args.width, seed=0)
    batch = {
        k: jax.device_put(jnp.asarray(v))
        for k, v in raw.items()
        if k != "groundtruth"
    }

    compiled = step.lower(state, batch).compile()
    hlo = compiled.as_text()
    convs, comp_of_fusion = parse_convs(hlo)
    print(f"{len(convs)} convolution instructions in the optimized HLO")

    # measured per-instruction device ms (exclusive, "XLA Ops" line)
    import glob
    import tempfile

    tmp = tempfile.mkdtemp(prefix="jax_roofline_")
    op_breakdown(lambda: step(state, batch), steps=args.steps,
                 trace_dir=tmp, verbose=False)
    dumps = sorted(glob.glob(os.path.join(tmp, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    # trace event names are FULL HLO instruction lines; key by the exact
    # lhs symbol. (The r4 report prefix-matched "fusion.2*" onto
    # fusion.23/fusion.234/... and summed every line whose TEXT mentioned
    # a custom-call OPERAND into the warp bucket — both systematically
    # inflated; r4's conv/warp family totals are superseded by this run.)
    measured = {}
    measured_rhs = {}
    if dumps:
        for name, ms, _count in summarize_xplane(dumps[-1], collapse=False):
            lhs = name.split(" = ")[0].strip().lstrip("%")
            measured[lhs] = measured.get(lhs, 0.0) + ms / args.steps
            measured_rhs[lhs] = name.split(" = ", 1)[-1]
    total_measured = sum(measured.values())

    # attribute each executed instruction's time to its conv(s); a fusion
    # hosting several convs splits its time by analytic FLOPs share
    host_convs = collections.defaultdict(list)
    for c in convs:
        host = c["name"] if c["comp"] == "ENTRY" else comp_of_fusion.get(
            c["comp"], c["name"]
        )
        host_convs[host].append(c)
    matched = 0
    for host, cs in host_convs.items():
        ms = measured.get(host)
        if ms is None:
            for c in cs:
                c["measured_ms"] = None
            continue
        matched += 1
        gf = sum(c["gflops"] for c in cs) or 1.0
        for c in cs:
            c["measured_ms"] = ms * c["gflops"] / gf
    print(f"matched {matched}/{len(host_convs)} conv-hosting instructions "
          f"to trace events")

    # family table
    fams = collections.defaultdict(
        lambda: {"count": 0, "gflops": 0.0, "roofline_ms": 0.0,
                 "padded_roofline_ms": 0.0, "measured_ms": 0.0,
                 "unmatched": 0}
    )
    for c in convs:
        f = fams[conv_family(c)]
        f["count"] += 1
        f["gflops"] += c["gflops"]
        f["roofline_ms"] += roofline_ms(c)
        f["padded_roofline_ms"] += roofline_ms(c, padded=True)
        if c.get("measured_ms") is None:
            f["unmatched"] += 1
        else:
            f["measured_ms"] += c["measured_ms"]

    # the Pallas custom calls (opaque to the HLO parse above): only
    # instructions whose own OPCODE is custom-call, identified from the
    # rhs text (operand mentions don't count)
    warp_measured = sum(
        ms for name, ms in measured.items()
        if re.search(r"\)?\s*custom-call\(", measured_rhs.get(name, ""))
        and "tpu_custom_call" in measured_rhs.get(name, "")
    )
    warp_roofline = None
    if args.warp == "pallas":
        from unsupervised_pseuso_lidar_tpu.ops.pallas.warp import (
            fused_warp_flops,
        )

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
        # backward=True covers the whole differentiated call (VJP-forward
        # two-tap dot; the custom-VJP backward runs no kernel)
        wtotal = fused_warp_flops(jobs, args.height, args.width,
                                  col_band=args.col_band or None,
                                  backward=True)
        warp_roofline = wtotal / 1e9 / PEAK_BF16_TFLOPS / 1e3 * 1e3  # ms

    device_kind = jax.devices()[0].device_kind
    rows = sorted(fams.items(), key=lambda kv: -kv[1]["measured_ms"])
    conv_meas = sum(f["measured_ms"] for _, f in rows)
    conv_roof = sum(f["roofline_ms"] for _, f in rows)
    conv_pad = sum(f["padded_roofline_ms"] for _, f in rows)
    report = {
        "device": device_kind,
        "backend": jax.default_backend(),
        "config": f"b{args.batch} {args.width}x{args.height} bf16 "
                  f"warp={args.warp} loss={args.loss_mode} "
                  f"col_band={args.col_band or 'auto'}",
        "peak_bf16_tflops": PEAK_BF16_TFLOPS,
        "hbm_gbps": HBM_GBPS,
        "trace_total_ms_per_step": round(total_measured, 3),
        "conv_measured_ms": round(conv_meas, 3),
        "conv_roofline_ms": round(conv_roof, 3),
        "conv_padded_roofline_ms": round(conv_pad, 3),
        "warp_customcall_measured_ms": round(warp_measured, 3),
        "warp_mxu_roofline_ms": round(warp_roofline, 3) if warp_roofline else None,
        "families": {
            name: {
                "count": f["count"],
                "gflops": round(f["gflops"], 2),
                "roofline_ms": round(f["roofline_ms"], 3),
                "padded_roofline_ms": round(f["padded_roofline_ms"], 3),
                "measured_ms": round(f["measured_ms"], 3),
                "efficiency": round(f["roofline_ms"] / f["measured_ms"], 3)
                if f["measured_ms"] > 0 else None,
                "efficiency_vs_padded": round(
                    min(f["padded_roofline_ms"], 999) / f["measured_ms"], 3)
                if f["measured_ms"] > 0 else None,
                "unmatched": f["unmatched"],
            }
            for name, f in rows
        },
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "ROOFLINE.json")
    with open(out, "w") as fp:
        json.dump(report, fp, indent=2)

    print(f"\n| family | n | GFLOPs | SOL ms | lane-pad ms | measured ms "
          f"| eff | eff vs pad |")
    print(f"|---|---|---|---|---|---|---|---|")
    for name, f in rows:
        eff = (f["roofline_ms"] / f["measured_ms"]) if f["measured_ms"] else 0
        effp = (
            f["padded_roofline_ms"] / f["measured_ms"]
            if f["measured_ms"] else 0
        )
        print(f"| {name} | {f['count']} | {f['gflops']:.1f} | "
              f"{f['roofline_ms']:.2f} | {f['padded_roofline_ms']:.2f} | "
              f"{f['measured_ms']:.2f} | {eff:.0%} | {min(effp, 9.99):.0%} |")
    print(f"| conv total |  |  | {conv_roof:.2f} | {conv_pad:.2f} | "
          f"{conv_meas:.2f} | {conv_roof / conv_meas:.0%} | "
          f"{conv_pad / conv_meas:.0%} |" if conv_meas else "")
    if warp_roofline:
        print(f"| pallas warp (custom-call) |  |  | {warp_roofline:.2f} |  | "
              f"{warp_measured:.2f} | {warp_roofline / warp_measured:.0%} |  |"
              if warp_measured else "")
    print(f"\ntrace total {total_measured:.1f} ms/step; non-conv non-warp = "
          f"{total_measured - conv_meas - warp_measured:.1f} ms")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
