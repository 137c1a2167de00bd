"""One-off diagnostic: per-instruction trace of the PRODUCTION train step
(min objective, col_band 256 — bench.py defaults), with the full HLO text
of the instructions hosting the narrow-channel convolutions, to find why
fwd_3x3_co32 runs at 0.38 of even its lane-padded roofline (VERDICT r4
next-step 1a).
"""

from __future__ import annotations

import glob
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
from unsupervised_pseuso_lidar_tpu.utils.trace import op_breakdown, summarize_xplane

B, H, W = 12, 192, 640
STEPS = 10

config = Config.from_dict(
    {
        "model": {"name": "diag", "depth": {"name": "DispResNet"},
                  "pose": {"name": "PoseNet"}},
        "datasets": {"augmentation": {"image_width": W, "image_height": H}},
        "action": {"batch_size": B, "precision": "bf16"},
    }
)
state, depth_model, pose_model, tx = create_train_state(
    config, jax.random.PRNGKey(0), 1000, dtype=jnp.bfloat16
)
objective = dict(loss_mode="min", depth_norm=True, smooth_on="disp",
                 smooth_weight=0.001)
step = make_train_step(depth_model, pose_model, tx, warp_impl="pallas",
                       col_band=256, donate=False, **objective)
raw = synthetic_triplet_batch(B, H, W, seed=0)
batch = {k: jax.device_put(jnp.asarray(v)) for k, v in raw.items()
         if k != "groundtruth"}

compiled = step.lower(state, batch).compile()
hlo = compiled.as_text()
with open("/tmp/step_hlo.txt", "w") as f:
    f.write(hlo)
print(f"HLO written to /tmp/step_hlo.txt ({len(hlo.splitlines())} lines)")

tmp = tempfile.mkdtemp(prefix="jax_convdiag_")
op_breakdown(lambda: step(state, batch), steps=STEPS, trace_dir=tmp,
             verbose=False)
dumps = sorted(glob.glob(os.path.join(tmp, "**", "*.xplane.pb"),
                         recursive=True), key=os.path.getmtime)
rows = summarize_xplane(dumps[-1], collapse=False)
total = sum(ms for _, ms, _ in rows) / STEPS
print(f"\ntrace total {total:.2f} ms/step; top 45 instructions:")
for name, ms, count in rows[:45]:
    print(f"  {ms / STEPS:8.3f} ms  x{count:4d}  {name}")

with open("/tmp/instr_times.txt", "w") as f:
    for name, ms, count in rows:
        f.write(f"{ms / STEPS:.4f}\t{count}\t{name}\n")
print("full per-instruction times at /tmp/instr_times.txt")
