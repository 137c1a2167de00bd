#!/usr/bin/env python
"""Fetch + convert the ImageNet ResNet encoder init the parity run starts
from (docs/PARITY_RUNBOOK.md step 2).

The reference gets these weights implicitly — `ResnetEncoder(18,
pretrained=True)` triggers a torchvision download at first model build
(/root/reference/models/depth/resnet_dispnet.py:30). This script makes
that acquisition explicit, reproducible, and torch-free at training time:

  python scripts/fetch_pretrained.py --out pretrained/resnet18_imagenet.npz

1. obtains the torchvision IMAGENET1K_V1 state dict — from `--source
   <file.pth>` when you already have it (air-gapped hosts), else by
   downloading the pinned torchvision URL (checksum-verified: torchvision
   embeds the first 8 sha256 hex chars in the filename);
2. strips the classifier head (no counterpart in DispResNet) and writes
   the remaining tensors as an .npz in the RAW torchvision key schema —
   exactly what `model.depth.pretrained_path` accepts
   (train/checkpoint.normalize_depth_pretrained_state);
3. prints the sha256 of both the source and the emitted artifact;
4. with --verify, imports the artifact into a freshly initialized
   DispResNet and reports the number of encoder tensors replaced.
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

# torchvision IMAGENET1K_V1 weight files; the 8-hex-char suffix in each
# filename is the first 8 chars of the file's sha256 (torchvision's own
# integrity convention, checked below after download)
TORCHVISION_URLS = {
    "resnet18": "https://download.pytorch.org/models/resnet18-f37072fd.pth",
    "resnet34": "https://download.pytorch.org/models/resnet34-b627a593.pth",
    "resnet50": "https://download.pytorch.org/models/resnet50-0676ba61.pth",
    "resnet101": "https://download.pytorch.org/models/resnet101-63fe2227.pth",
    "resnet152": "https://download.pytorch.org/models/resnet152-394f9c45.pth",
}


def sha256_file(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def download(url: str, dest: str) -> str:
    import urllib.request

    print(f"downloading {url}")
    urllib.request.urlretrieve(url, dest)
    digest = sha256_file(dest)
    expected_prefix = url.rsplit("-", 1)[1].split(".")[0]
    if not digest.startswith(expected_prefix):
        os.remove(dest)
        raise RuntimeError(
            f"checksum mismatch: sha256 {digest[:8]} != filename-pinned "
            f"{expected_prefix} for {url}"
        )
    return dest


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="Fetch/convert an ImageNet ResNet init to .npz"
    )
    parser.add_argument("--arch", default="resnet18",
                        choices=sorted(TORCHVISION_URLS))
    parser.add_argument("--source", default=None,
                        help="local torchvision .pth (skips the download)")
    parser.add_argument("--out", default="pretrained/resnet18_imagenet.npz")
    parser.add_argument("--verify", action="store_true",
                        help="import the artifact into a DispResNet init "
                        "and report the tensors replaced")
    args = parser.parse_args(argv)

    import numpy as np
    import torch

    if args.source:
        src = args.source
        if not os.path.exists(src):
            parser.error(f"--source {src}: no such file")
    else:
        os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
        src = download(
            TORCHVISION_URLS[args.arch],
            args.out + ".download.pth",
        )
    print(f"source sha256: {sha256_file(src)}  ({src})")

    state = torch.load(src, map_location="cpu", weights_only=True)
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    arrays = {
        k: np.asarray(v.numpy())
        for k, v in state.items()
        if not k.startswith("fc.")  # classifier head: no DispResNet counterpart
    }
    if "conv1.weight" not in arrays or "layer1.0.conv1.weight" not in arrays:
        raise SystemExit(
            "source is not a torchvision resnet state dict "
            "(missing conv1.weight / layer1.*)"
        )
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    np.savez(args.out, **arrays)
    if not args.source and os.path.exists(src):
        os.remove(src)
    print(
        f"wrote {args.out}: {len(arrays)} tensors, "
        f"{os.path.getsize(args.out)} bytes"
    )
    print(f"artifact sha256: {sha256_file(args.out)}")
    print(
        "use via config:  model.depth.pretrained_path: "
        f"'{args.out}'"
    )

    if args.verify:
        import jax
        import jax.numpy as jnp

        from unsupervised_pseuso_lidar_tpu.models import build_model
        from unsupervised_pseuso_lidar_tpu.train.checkpoint import (
            load_pretrained_depth,
        )

        depth = int(args.arch.replace("resnet", ""))
        model = build_model("DispResNet", num_layers=depth)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3), jnp.float32),
            train=False,
        )
        params, stats = load_pretrained_depth(
            variables["params"], variables["batch_stats"], args.out
        )
        n = sum(1 for _ in jax.tree_util.tree_leaves(params))
        print(f"verify OK: imported into DispResNet({depth}); "
              f"{n} param tensors in the resulting tree")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
