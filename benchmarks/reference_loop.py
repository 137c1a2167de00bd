"""Same-data training comparison: the reference's OWN trainer vs this
framework, end-to-end, on one synthetic KITTI-format tree.

The north-star accuracy clause (BASELINE.md: Eigen abs-rel/RMSE within 1%
of the reference on KITTI) needs real KITTI, which this host does not
have. The strongest executable substitute is to let BOTH stacks train
end-to-end on the SAME on-disk KITTI-format data — the reference's
unmodified Trainer (torch CPU; its train.py just builds Trainer(config)
and calls .train(), /root/reference/train.py:1-8) against our Trainer via
the same cli wiring a user runs — and score both with one shared numpy
metric routine on a held-out drive. Unlike tests/test_reference_oracle.py
(which proves per-component numerical parity), this exercises the whole
loop: loader -> models -> loss -> optimizer -> learned depth.

Reference-side shims (documented; NO reference code is modified):
  * wandb is not installed -> stub module (MLOps=False, only the import
    runs, /root/reference/trainer.py:12).
  * torchvision is not installed -> faithful minimal stand-ins for the
    five transforms the loader composes (trainer.py:97-103) and for
    torchvision.models.resnet18 (the standard architecture under the
    standard attribute names, kaiming init). Pretrained ImageNet weights
    are NOT downloadable on this host (zero egress; the reference pulls
    them in resnet_dispnet.py:30) -> BOTH stacks train FROM SCRATCH.
  * torch.Tensor.cuda patched to identity (the transform.py:134
    hardcode) — the same single patch tests/test_reference_oracle.py uses.

Tree-layout constraints (all from the reference's loader):
  * dataloaders.py:152/:162 slice absolute sample paths at HARD offsets —
    [:29] must be the calib (date) dir WITH trailing slash (the
    reference's Calibration concats filenames onto it without one,
    geometry/calibration.py:39) and [:55] the drive dir — so the tree
    root must be exactly 17 characters, with the canonical 26-char KITTI
    drive dirname ("2011_09_26_drive_0001_sync").
  * geometry/transform.py:110 hardcodes batch 4 (K_hom.repeat(4, 1, 1)),
    so the comparison trains at the reference's own default batch_size 4
    (configs/basic_config.yaml:36).
  * The reference's default PoseFc is resolution-locked to 384x1280
    (pose_fc.py fc_loc = Linear(12*3*10, ...)), far beyond a CPU training
    budget — both stacks use the size-agnostic PoseNet the reference also
    ships (models/pose/pose_net.py), with its own DispResNet depth net.

Scene: a slanted textured plane swept by a translating camera (the same
closed-form geometry as data/synthetic.py, generalized to a whole drive of
frames), so ground-truth depth varies 5-50 m across the image and the
ego-motion is a constant translation the pose nets must learn.

Usage:
  python benchmarks/reference_loop.py all [--epochs 25] [--frames 34]
or phase by phase (each phase is its own process so the reference's
sys.modules shims never touch our stack):
  python benchmarks/reference_loop.py tree|ref|ours|report [...]

Writes benchmarks/REFLOOP.json.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import re
import subprocess
import sys
import time

import numpy as np

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATE = "2011_09_26"
TRAIN_DRIVES = ("2011_09_26_drive_0001_sync", "2011_09_26_drive_0002_sync")
EVAL_DRIVE = "2011_09_26_drive_0003_sync"
EARTH_RADIUS = 6378137.0  # the reference's Mercator constant (oxts_parser)


# --------------------------------------------------------------------------
# phase "tree": render the synthetic KITTI-format dataset
# --------------------------------------------------------------------------

def _render_drive(drive_dir, gt_dir, n_frames, h, w, focal, depth, tx,
                  slant_deg, seed, scene="plane", n_objects=3):
    """Frames of a camera translating +x through a synthetic world.

    Same ray math as data/synthetic.synthetic_triplet_batch (which renders
    a 3-view triplet at cam_tx in {0, -tx, +tx}); here frame i is rendered
    at cam_tx = i*tx so CONSECUTIVE frames form valid training triplets,
    and per-frame ground-truth depth is the ray z-depth.

    scene="plane": the r3/r4 world — one slanted textured plane.
    scene="multiobject" (VERDICT r4 next-step 2): the slanted ground
    plane PLUS `n_objects` static textured billboards (fronto-parallel
    world rectangles at distinct depths, z-buffered nearest-hit), giving
    the head-to-head real depth DISCONTINUITIES, inter-object occlusion,
    and surfaces at several rigid depths — the failure modes a
    smoothness-filled plane world cannot expose. Billboard world-x
    centers are spread along the camera's travel so objects enter and
    leave view over the drive."""
    from PIL import Image

    sys.path.insert(0, REPO)
    from unsupervised_pseuso_lidar_tpu.data.synthetic import _texture

    rng = np.random.default_rng(seed)
    phases = np.stack(
        [
            rng.uniform(0.02, 0.3, 8),
            rng.uniform(0.02, 0.3, 8),
            rng.uniform(0, 2 * np.pi, 8),
            rng.uniform(0, 2 * np.pi, 8),
        ],
        axis=-1,
    )
    cx, cy = w / 2.0, h / 2.0
    tan_a = float(np.tan(np.radians(slant_deg)))
    vv, uu = np.meshgrid(
        np.arange(h, dtype=np.float32), np.arange(w, dtype=np.float32),
        indexing="ij",
    )
    dx = (uu - cx) / focal
    dy = (vv - cy) / focal
    denom = np.maximum(1.0 - tan_a * dx, 1e-3)

    objects = []
    if scene == "multiobject":
        travel = (n_frames - 1) * tx
        for j in range(n_objects):
            # nearer than the ground plane over most of the image;
            # distinct depths with real gaps between them
            dj = depth * (0.30 + 0.18 * j) * rng.uniform(0.9, 1.1)
            half_wx = rng.uniform(0.55, 0.95) * dj * (w / 4.0) / focal
            half_wy = rng.uniform(0.45, 0.8) * dj * (h / 4.0) / focal
            # spread along the travel so each billboard crosses the view
            xc = travel * (0.15 + 0.7 * (j + 0.5) / n_objects) + dj * (
                rng.uniform(-0.1, 0.1)
            )
            yc = rng.uniform(-0.25, 0.25) * dj * (h / 2.0) / focal
            obj_phases = np.stack(
                [
                    rng.uniform(0.3, 0.9, 8),
                    rng.uniform(0.3, 0.9, 8),
                    rng.uniform(0, 2 * np.pi, 8),
                    rng.uniform(0, 2 * np.pi, 8),
                ],
                axis=-1,
            )
            objects.append((dj, xc - half_wx, xc + half_wx,
                            yc - half_wy, yc + half_wy, obj_phases))
        # z-buffer compositing walks far -> near
        objects.sort(key=lambda o: -o[0])

    img_dir = os.path.join(drive_dir, "image_02", "data")
    oxts_dir = os.path.join(drive_dir, "oxts", "data")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(oxts_dir, exist_ok=True)
    os.makedirs(gt_dir, exist_ok=True)

    # eastward OXTS motion whose Mercator x-increment is tx meters per
    # frame (lat fixed; only the PARSEABILITY matters for this run — the
    # default training path regresses pose with PoseNet and never reads
    # these, trainer.py:301-306)
    lat = 49.0
    scale = math.cos(math.radians(lat))
    dlon_deg = math.degrees(tx / (scale * EARTH_RADIUS))
    rest = " ".join(["0.0"] * 17) + " 0.0 0.0 1 4 5 6 7"

    for i in range(n_frames):
        cam_tx = i * tx
        lam = (depth + tan_a * cam_tx) / denom
        su = (cam_tx + lam * dx) * focal / depth + cx
        sv = (lam * dy) * focal / depth + cy
        img = _texture(su, sv, phases)
        for dj, x0, x1, y0, y1, obj_phases in objects:
            # ray ^ z=dj plane in world coords (billboards are STATIC
            # world objects: texture is a function of world coords only,
            # so they parallax-shift rigidly with 1/dj)
            px = cam_tx + dj * dx
            py = dj * dy
            inside = (
                (px >= x0) & (px <= x1) & (py >= y0) & (py <= y1)
                & (dj < lam)
            )
            tex = _texture((px - x0) * focal / dj, (py - y0) * focal / dj,
                           obj_phases)
            img[inside] = tex[inside]
            lam = np.where(inside, dj, lam)
        img = (img * 255.0).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(img_dir, f"{i:010d}.png"))
        gt16 = np.clip(lam * 256.0, 0, 65535).astype(np.uint16)
        Image.fromarray(gt16).save(os.path.join(gt_dir, f"{i:010d}.png"))
        lon = 8.43 + i * dlon_deg
        with open(os.path.join(oxts_dir, f"{i:010d}.txt"), "w") as f:
            f.write(f"{lat} {lon} 114.5 0.0 0.0 0.0 {rest}\n")


def _write_calib(date_dir, focal, cx, cy):
    """Calibration triplet both parsers read (ours: geometry/calibration;
    reference: geometry/calibration.py:36-89). Rectification = identity,
    camera at the IMU/velo origin — the render IS the rectified view."""
    k = f"{focal:.6e} 0.0 {cx:.6e} 0.0 {focal:.6e} {cy:.6e} 0.0 0.0 1.0"
    p = (f"{focal:.6e} 0.0 {cx:.6e} 0.0 "
         f"0.0 {focal:.6e} {cy:.6e} 0.0 "
         "0.0 0.0 1.0 0.0")
    ident = "1.0 0.0 0.0 0.0 1.0 0.0 0.0 0.0 1.0"
    with open(os.path.join(date_dir, "calib_cam_to_cam.txt"), "w") as f:
        f.write(f"K_02: {k}\nP_rect_02: {p}\nR_rect_02: {ident}\n")
    with open(os.path.join(date_dir, "calib_velo_to_cam.txt"), "w") as f:
        f.write(f"R: {ident}\nT: 0.0 0.0 0.0\n")
    with open(os.path.join(date_dir, "calib_imu_to_velo.txt"), "w") as f:
        f.write(f"R: {ident}\nT: 0.0 0.0 0.0\n")


def phase_tree(args):
    root = args.root
    # dataloaders.py:152 slices [:29] and geometry/calibration.py:39
    # string-concats filenames onto it WITHOUT a slash, so the slice must
    # be "<root>/<date>/" INCLUDING the trailing slash -> root is 17 chars
    assert len(root) == 29 - 2 - len(DATE), (
        f"tree root must be exactly {29 - 2 - len(DATE)} chars so the "
        f"reference's dataloaders.py:152 '[:29]' slice is the date dir "
        f"WITH trailing slash (got {len(root)}: {root!r})"
    )
    for d in TRAIN_DRIVES + (EVAL_DRIVE,):
        # [0:55] must be "<root>/<date>/<drive>" (dataloaders.py:162):
        # the canonical KITTI drive dirname is exactly 26 chars
        assert len(d) == 55 - 29, "drive dirname must be 26 chars ([:55])"
    date_dir = os.path.join(root, DATE)
    os.makedirs(date_dir, exist_ok=True)
    _write_calib(date_dir, args.focal, args.width / 2.0, args.height / 2.0)

    def frame(drive, i):
        return os.path.join(date_dir, drive, "image_02", "data",
                            f"{i:010d}.png")

    def gt(drive, i):
        return os.path.join(date_dir, drive, "proj_depth", f"{i:010d}.png")

    splits = {"train": [], "eval": []}
    for k, drive in enumerate(TRAIN_DRIVES + (EVAL_DRIVE,)):
        n = args.frames if drive != EVAL_DRIVE else max(args.frames // 3, 5)
        _render_drive(
            os.path.join(date_dir, drive),
            os.path.join(date_dir, drive, "proj_depth"),
            n, args.height, args.width, args.focal, args.depth, args.tx,
            args.slant_deg, seed=args.seed * 1000 + 1234 + k,
            scene=args.scene, n_objects=args.n_objects,
        )
        key = "eval" if drive == EVAL_DRIVE else "train"
        for i in range(1, n - 1):
            splits[key].append(
                f"{frame(drive, i)} {frame(drive, i - 1)} "
                f"{frame(drive, i + 1)} {gt(drive, i)}"
            )
    os.makedirs(args.workdir, exist_ok=True)
    for key, lines in splits.items():
        with open(os.path.join(args.workdir, f"{key}_split.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")
    print(f"tree: {len(splits['train'])} train / {len(splits['eval'])} eval "
          f"triplets under {root}")


# --------------------------------------------------------------------------
# phase "ref": the reference's own Trainer, unmodified, on torch CPU
# --------------------------------------------------------------------------

def _install_torchvision_stub():
    """Minimal faithful torchvision: the five transforms trainer.py:97-103
    composes, and models.resnet18 (standard torchvision attribute names so
    ResnetEncoder.forward's encoder.conv1/bn1/layer1..4 accesses work,
    resnet_dispnet.py:35-46)."""
    import types

    import torch
    import torch.nn as nn
    from PIL import Image

    class ToTensor:
        def __call__(self, pic):
            if isinstance(pic, Image.Image):
                arr = np.array(pic)
                if arr.ndim == 2:
                    arr = arr[None]
                else:
                    arr = arr.transpose(2, 0, 1)
                t = torch.from_numpy(arr.copy())
                # torchvision divides by 255 for uint8 PIL modes only
                if t.dtype == torch.uint8:
                    t = t.float().div(255.0)
                return t.float()
            arr = np.asarray(pic)
            if arr.ndim == 2:
                arr = arr[None]
            else:
                arr = arr.transpose(2, 0, 1)
            t = torch.from_numpy(arr.copy())
            if t.dtype == torch.uint8:
                t = t.float().div(255.0)
            return t.float()

    class ToPILImage:
        def __call__(self, t):
            arr = t.detach().cpu().numpy()
            if arr.shape[0] == 1:  # float -> mode 'F', unscaled
                return Image.fromarray(arr[0].astype(np.float32), mode="F")
            # 3-channel float: torchvision mul(255).byte()
            arr = (arr.transpose(1, 2, 0) * 255.0).astype(np.uint8)
            return Image.fromarray(arr, mode="RGB")

    class Resize:
        def __init__(self, size):
            self.size = size  # (h, w)

        def __call__(self, img):
            h, w = self.size
            return img.resize((w, h), Image.BILINEAR)

    class Normalize:
        def __init__(self, mean, std):
            self.mean = torch.tensor(mean).view(-1, 1, 1)
            self.std = torch.tensor(std).view(-1, 1, 1)

        def __call__(self, t):
            return (t - self.mean) / self.std

    def _conv3(cin, cout, stride=1):
        return nn.Conv2d(cin, cout, 3, stride=stride, padding=1, bias=False)

    class BasicBlock(nn.Module):
        expansion = 1

        def __init__(self, cin, cout, stride=1, downsample=None):
            super().__init__()
            self.conv1 = _conv3(cin, cout, stride)
            self.bn1 = nn.BatchNorm2d(cout)
            self.relu = nn.ReLU(inplace=True)
            self.conv2 = _conv3(cout, cout)
            self.bn2 = nn.BatchNorm2d(cout)
            self.downsample = downsample

        def forward(self, x):
            idn = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            if self.downsample is not None:
                idn = self.downsample(x)
            return self.relu(out + idn)

    class ResNet(nn.Module):
        def __init__(self, layers=(2, 2, 2, 2)):
            super().__init__()
            self.inplanes = 64
            self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
            self.layer1 = self._make_layer(64, layers[0])
            self.layer2 = self._make_layer(128, layers[1], 2)
            self.layer3 = self._make_layer(256, layers[2], 2)
            self.layer4 = self._make_layer(512, layers[3], 2)
            self.avgpool = nn.AdaptiveAvgPool2d(1)
            self.fc = nn.Linear(512, 1000)
            for m in self.modules():  # torchvision's init scheme
                if isinstance(m, nn.Conv2d):
                    nn.init.kaiming_normal_(
                        m.weight, mode="fan_out", nonlinearity="relu"
                    )
                elif isinstance(m, nn.BatchNorm2d):
                    nn.init.constant_(m.weight, 1.0)
                    nn.init.constant_(m.bias, 0.0)

        def _make_layer(self, planes, blocks, stride=1):
            downsample = None
            if stride != 1 or self.inplanes != planes:
                downsample = nn.Sequential(
                    nn.Conv2d(self.inplanes, planes, 1, stride, bias=False),
                    nn.BatchNorm2d(planes),
                )
            layers = [BasicBlock(self.inplanes, planes, stride, downsample)]
            self.inplanes = planes
            for _ in range(1, blocks):
                layers.append(BasicBlock(planes, planes))
            return nn.Sequential(*layers)

    def resnet18(pretrained=False, **kwargs):
        if pretrained:
            print(
                "[reference_loop] NOTE: pretrained ImageNet weights are not "
                "available on this host (no egress); resnet18 starts from "
                "random init — both frameworks train from scratch."
            )
        return ResNet()

    def _unavailable(*a, **k):
        raise NotImplementedError(
            "reference_loop's torchvision stub implements resnet18 only"
        )

    tv = types.ModuleType("torchvision")
    tr = types.ModuleType("torchvision.transforms")
    tr_inner = types.ModuleType("torchvision.transforms.transforms")
    utils_mod = types.ModuleType("torchvision.utils")
    models_mod = types.ModuleType("torchvision.models")
    for mod in (tr, tr_inner):
        mod.ToTensor = ToTensor
        mod.ToPILImage = ToPILImage
        mod.Resize = Resize
        mod.Normalize = Normalize
    tr.transforms = tr_inner
    models_mod.resnet18 = resnet18
    for name in ("resnet34", "resnet50", "resnet101", "resnet152"):
        setattr(models_mod, name, _unavailable)
    tv.transforms = tr
    tv.utils = utils_mod
    tv.models = models_mod
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tr
    sys.modules["torchvision.transforms.transforms"] = tr_inner
    sys.modules["torchvision.utils"] = utils_mod
    sys.modules["torchvision.models"] = models_mod


def _install_wandb_stub():
    import types

    wandb = types.ModuleType("wandb")
    wandb.init = wandb.log = wandb.watch = lambda *a, **k: None
    wandb.Table = lambda *a, **k: None
    wandb.Image = lambda *a, **k: None
    sys.modules["wandb"] = wandb


def _ref_config(args, split_path, epochs):
    return {
        "model": {
            "name": "refloop",
            "depth": {"name": "DispResNet", "file": "resnet_dispnet",
                      "version": "1"},
            "pose": {"name": "PoseNet", "file": "pose_net", "version": "1"},
        },
        "datasets": {
            "path": args.root,
            "split": split_path,
            "augmentation": {
                "image_width": args.width,
                "image_height": args.height,
                "shuffle": True,
            },
            "sequence_length": 3,
            "dataset": ["KITTI"],
        },
        "action": {
            "mode": "train",
            "MLOps": False,
            "log_freq": 100,
            "from_scratch": True,
            "split": [1.0, 0.0],
            "random_seed": args.seed,
            "batch_size": 4,  # transform.py:110 hardcodes batch 4
            "num_epochs": epochs,
            "num_workers": 0,  # 1-core host
            "optimizer": {
                "name": "Adam",
                "depth": {"lr": args.lr},
                "pose": {"lr": args.lr},
            },
            # keep lr constant over this short run (both sides)
            "scheduler": {"name": "StepLR", "step_size": 10000, "gamma": 1.0},
        },
    }


def phase_ref(args):
    import torch

    torch.manual_seed(args.seed)
    sandbox = os.path.join(args.workdir, "ref_sandbox")
    os.makedirs(os.path.join(sandbox, "pretrained"), exist_ok=True)
    os.chdir(sandbox)
    _install_wandb_stub()
    _install_torchvision_stub()
    torch.Tensor.cuda = lambda self, *a, **k: self  # transform.py:134
    sys.path.insert(0, REF)

    import trainer as ref_trainer_mod  # /root/reference/trainer.py

    config = _ref_config(
        args, os.path.join(args.workdir, "train_split.txt"), args.epochs
    )
    t0 = time.perf_counter()
    trainer = ref_trainer_mod.Trainer(config)
    steps_per_epoch = len(trainer.train_loader)

    # capture the reference's per-step 'print(sum(self.loss))' lines
    # (trainer.py:265) for the loss curve
    import contextlib
    import io

    log_path = os.path.join(args.workdir, "ref_train.log")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        trainer.train()
    train_secs = time.perf_counter() - t0
    log_text = buf.getvalue()
    with open(log_path, "w") as f:
        f.write(log_text)
    losses = [
        float(m) for m in re.findall(r"tensor\(([0-9.eE+-]+)", log_text)
    ]

    # predict depth on the held-out drive with the trained model
    trainer.set_eval()
    eval_cfg = _ref_config(
        args, os.path.join(args.workdir, "eval_split.txt"), 0
    )
    from dataloaders import UnSupKittiDataset as RefDataset
    from geometry.pose_geometry import disp_to_depth as ref_disp_to_depth

    eval_ds = RefDataset(eval_cfg, transforms=trainer.dataset.transforms)
    preds, gts, pose_preds = [], [], []
    with torch.no_grad():
        for i in range(len(eval_ds)):
            s = eval_ds[i]
            disps = trainer.depth_model(s["tgt"].unsqueeze(0))
            depth = ref_disp_to_depth([disps])[0][0]  # the reference's own
            preds.append(depth.squeeze().cpu().numpy())
            # the reference feeds the raw uint16 PNG values through its
            # pipeline without KITTI's /256 scaling (dataloaders.py:42-47);
            # convert to meters here so both frameworks are scored in the
            # same units by the shared metric routine
            gts.append(s["groundtruth"].squeeze().cpu().numpy() / 256.0)
            # pose head-to-head (VERDICT r4 next-step 3): the reference's
            # own pose net on the held-out triplets, exactly as its
            # trainer calls it (trainer.py:306)
            refs = [r.unsqueeze(0) for r in s["ref_imgs"]]
            pose = trainer.pose_model(s["tgt"].unsqueeze(0), refs)
            pose_preds.append(pose.squeeze(0).cpu().numpy())
    np.savez(
        os.path.join(args.workdir, "ref_eval.npz"),
        preds=np.stack(preds), gts=np.stack(gts),
        poses=np.stack(pose_preds),
    )
    out = {
        "framework": "reference (torch CPU, unmodified trainer)",
        "steps": args.epochs * steps_per_epoch,
        "steps_per_epoch": steps_per_epoch,
        "epochs": args.epochs,
        "train_seconds": round(train_secs, 1),
        "sec_per_step": round(train_secs / max(args.epochs * steps_per_epoch, 1), 3),
        "loss_first": losses[0] if losses else None,
        "loss_last": losses[-1] if losses else None,
    }
    with open(os.path.join(args.workdir, "ref_result.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


# --------------------------------------------------------------------------
# phase "ours": this framework through its own cli wiring
# --------------------------------------------------------------------------

def phase_ours(args):
    sys.path.insert(0, REPO)
    if args.backend == "cpu":
        # must happen before backend init; the axon plugin ignores the
        # JAX_PLATFORMS env var (verify skill), only the config works
        import jax

        jax.config.update("jax_platforms", "cpu")
    import yaml

    cfg_path = os.path.join(args.workdir, "ours_config.yaml")
    raw = _ref_config(
        args, os.path.join(args.workdir, "train_split.txt"), args.epochs
    )
    # production TPU execution settings (configs/tpu_v5e.yaml)
    raw["action"]["warp_impl"] = "pallas"
    raw["action"]["precision"] = "bf16"
    raw["action"]["num_workers"] = 2
    raw["action"]["checkpoint_dir"] = os.path.join(args.workdir, "ours_ckpt")
    if args.objective == "production":
        # the objective this framework ships for real training (min +
        # automask reprojection, disparity smoothness at the monodepth2
        # weight — configs/{basic_config,tpu_v5e}.yaml "objective
        # conditioning"). The reference's LITERAL objective (zeros-padded
        # 'mean' L1 + unweighted depth smoothness) has a trivial solution
        # — push every warp sample out of frame and the L1 freezes at
        # mean|tgt|, which BEATS a badly-warped image — that this
        # framework's init falls into within 3 steps on this scene
        # (measured; --objective reference reproduces it), while
        # automasking is structurally immune: a zero warp can never beat
        # the identity reference frame at any pixel.
        raw["action"]["loss_mode"] = "min"
        raw["action"]["depth_norm"] = True
        raw["action"]["smooth_on"] = "disp"
        raw["action"]["smooth_weight"] = 0.001
    # else: the dataclass defaults ARE the reference-literal objective
    # (loss_mode 'mean', smooth_on 'depth', weight 1 — losses/total.py)
    with open(cfg_path, "w") as f:
        yaml.safe_dump(raw, f)

    from unsupervised_pseuso_lidar_tpu.cli import train as cli_train

    t0 = time.perf_counter()
    trainer = cli_train.main(["--config", cfg_path, "--mesh", "1"])
    train_secs = time.perf_counter() - t0

    # predict on the held-out drive through the SAME forward the trainer
    # uses (train/trainer.forward_batch, train=False)
    import jax

    from unsupervised_pseuso_lidar_tpu.data.kitti import UnSupKittiDataset
    from unsupervised_pseuso_lidar_tpu.geometry.warp import disp_to_depth
    from unsupervised_pseuso_lidar_tpu.train.config import load_config
    from unsupervised_pseuso_lidar_tpu.train.trainer import forward_batch

    eval_cfg = load_config(cfg_path)
    eval_cfg.datasets.split = os.path.join(args.workdir, "eval_split.txt")
    eval_ds = UnSupKittiDataset(eval_cfg)
    def _fwd(p, bs, b):
        disps_tgt, _, poses, _ = forward_batch(
            trainer.depth_model, trainer.pose_model, p, bs, b, train=False
        )
        return disps_tgt[0], poses

    fwd = jax.jit(_fwd)
    preds, gts, pose_preds = [], [], []
    for batch in eval_ds.batches(
        range(len(eval_ds)), batch_size=1, num_workers=1, drop_last=False
    ):
        disp0, poses = fwd(
            trainer.state.params, trainer.state.batch_stats,
            {k: batch[k] for k in ("tgt", "ref_imgs", "intrinsics", "oxts")},
        )
        depth = disp_to_depth(disp0)
        # bf16 precision yields ml_dtypes.bfloat16 arrays, which np.savez
        # round-trips as raw void -> cast to float32 for the report phase
        preds.append(np.asarray(depth, dtype=np.float32)[0, ..., 0])
        gts.append(np.asarray(batch["groundtruth"], dtype=np.float32)[0])
        pose_preds.append(np.asarray(poses, dtype=np.float32)[0])
    if args.tag:
        tag = f"_{args.tag}"
    else:
        tag = "" if args.objective == "production" else f"_{args.objective}"
    np.savez(
        os.path.join(args.workdir, f"ours_eval{tag}.npz"),
        preds=np.stack(preds), gts=np.stack(gts),
        poses=np.stack(pose_preds),
    )
    steps = trainer.steps_per_epoch * args.epochs
    out = {
        "framework": "this framework (cli.train, pallas+bf16)",
        "objective": args.objective,
        "backend": jax.default_backend(),
        "steps": steps,
        "steps_per_epoch": trainer.steps_per_epoch,
        "epochs": args.epochs,
        "train_seconds": round(train_secs, 1),
        "sec_per_step": round(train_secs / max(steps, 1), 3),
    }
    if args.tag:
        out["protocol_note"] = args.note or args.tag
    with open(os.path.join(args.workdir, f"ours_result{tag}.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


# --------------------------------------------------------------------------
# phase "report": shared numpy metrics over both prediction sets
# --------------------------------------------------------------------------

def _depth_metrics(preds, gts):
    """Per-image median-scaled monocular depth metrics (the Eigen-protocol
    scaling both communities use; monocular SfM depth is scale-ambiguous).
    One shared routine scores BOTH frameworks — no framework code here."""
    abs_rel, sq_rel, rmse, a1 = [], [], [], []
    for pred, gt in zip(preds, gts):
        mask = gt > 1e-3
        p, g = pred[mask], gt[mask]
        p = p * (np.median(g) / np.median(p))
        p = np.clip(p, 1e-3, 80.0)
        thresh = np.maximum(g / p, p / g)
        abs_rel.append(np.mean(np.abs(g - p) / g))
        sq_rel.append(np.mean((g - p) ** 2 / g))
        rmse.append(np.sqrt(np.mean((g - p) ** 2)))
        a1.append(np.mean(thresh < 1.25))
    return {
        "abs_rel": round(float(np.mean(abs_rel)), 4),
        "sq_rel": round(float(np.mean(sq_rel)), 4),
        "rmse": round(float(np.mean(rmse)), 4),
        "a1": round(float(np.mean(a1)), 4),
    }


def _pose_metrics(poses, tx):
    """Numpy snippet-ATE + geodesic rotation error vs the closed-form
    ground truth of this scene (camera translates +x by tx per frame:
    tgt->ref0 = [+tx,0,0], tgt->ref1 = [-tx,0,0], rotation identity).

    Same protocol as eval/pose.pose_errors (per-snippet least-squares
    scale alignment of the predicted translations — monocular training
    is scale-ambiguous — then RMSE over the snippet's frame positions);
    implemented in plain numpy here so the report phase scores BOTH
    frameworks with shared, framework-free code. poses: [N, 2, 6]
    axis-angle+translation, the convention both stacks' warps train."""
    poses = np.asarray(poses, dtype=np.float64)
    t_pred = poses[:, :, 3:]  # [N, 2, 3]
    t_gt = np.zeros_like(t_pred)
    t_gt[:, 0, 0] = tx
    t_gt[:, 1, 0] = -tx
    num = np.sum(t_gt * t_pred, axis=(1, 2))
    den = np.maximum(np.sum(t_pred * t_pred, axis=(1, 2)), 1e-12)
    s = num / den  # per-snippet alignment scale
    diff = s[:, None, None] * t_pred - t_gt
    ate = np.sqrt(np.mean(np.sum(diff ** 2, axis=-1), axis=1))  # [N]

    v = poses[:, :, :3].reshape(-1, 3)
    theta = np.linalg.norm(v, axis=-1)  # GT rotation is identity, so the
    # geodesic angle of R_pred @ I^T is just the axis-angle magnitude
    rot_deg = np.degrees(theta).reshape(poses.shape[0], 2)
    return {
        "ate_m": round(float(np.mean(ate)), 5),
        "rot_err_deg": round(float(np.mean(rot_deg)), 4),
        "t_scale_mean": round(float(np.mean(s)), 3),
    }


def phase_report(args):
    report = {
        "scene": {
            "kind": args.scene, "seed": args.seed,
            "n_objects": args.n_objects if args.scene == "multiobject" else 0,
            "height": args.height, "width": args.width, "focal": args.focal,
            "plane_depth_m": args.depth, "tx_m_per_frame": args.tx,
            "slant_deg": args.slant_deg, "frames_per_train_drive": args.frames,
        },
        "protocol": (
            "both frameworks trained from scratch on the identical "
            "KITTI-format tree (same split file), batch 4, Adam "
            f"lr={args.lr}, {args.epochs} epochs; scored by one shared "
            "numpy routine (per-image median scaling) on the held-out "
            "drive"
        ),
        "shims": (
            "reference ran UNMODIFIED on torch CPU with wandb/torchvision "
            "stub modules (not installed here) and torch.Tensor.cuda "
            "patched to identity; pretrained ImageNet weights unavailable "
            "(no egress) so both stacks used random init"
        ),
    }
    for side, result, npz, required in (
        ("reference", "ref_result.json", "ref_eval.npz", True),
        ("ours", "ours_result.json", "ours_eval.npz", True),
        # equal-WALL-CLOCK row: ours trained for (about) the reference's
        # measured train_seconds instead of its step count — the
        # TPU-first comparison (a faster step buys more optimization
        # inside the same time budget), VERDICT r3 next-step 2
        ("ours_equal_time", "ours_result_equal_time.json",
         "ours_eval_equal_time.npz", False),
        # optional row: ours trained with the reference's LITERAL
        # objective (see phase_ours)
        ("ours_reference_objective", "ours_result_reference.json",
         "ours_eval_reference.npz", False),
    ):
        path = os.path.join(args.workdir, result)
        if not required and not os.path.exists(path):
            continue
        with open(path) as f:
            row = json.load(f)
        data = np.load(os.path.join(args.workdir, npz))
        row["eval"] = _depth_metrics(data["preds"], data["gts"])
        if "poses" in data:
            row["pose"] = _pose_metrics(data["poses"], args.tx)
        report[side] = row
    # constant-prediction floor: what a depth-less model scores after
    # median scaling on this scene (context for the learned numbers)
    data = np.load(os.path.join(args.workdir, "ref_eval.npz"))
    const = [np.full_like(g, 1.0) for g in data["gts"]]
    report["constant_prediction_floor"] = _depth_metrics(
        np.stack(const), data["gts"]
    )
    out = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "REFLOOP.json"
    )
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


def phase_all(args):
    script = os.path.abspath(__file__)
    base = [
        sys.executable, script,
        "--root", args.root, "--workdir", args.workdir,
        "--height", str(args.height), "--width", str(args.width),
        "--focal", str(args.focal), "--depth", str(args.depth),
        "--tx", str(args.tx), "--slant-deg", str(args.slant_deg),
        "--frames", str(args.frames), "--epochs", str(args.epochs),
        "--lr", str(args.lr), "--backend", args.backend,
        "--objective", args.objective,
        "--scene", args.scene, "--n-objects", str(args.n_objects),
        "--seed", str(args.seed),
    ] + (["--out", args.out] if args.out else [])
    # each phase in its own process: the ref phase's sys.modules shims
    # (fake torchvision/wandb, top-level 'models'/'geometry' packages)
    # must never coexist with our stack's imports
    for phase, budget in (("tree", 600), ("ref", args.ref_timeout),
                          ("ours", 3600)):
        print(f"=== phase {phase} ===", flush=True)
        subprocess.run(base[:2] + [phase] + base[2:], check=True,
                       timeout=budget)
    # equal-wall-clock leg: rerun ours with as many whole epochs as fit
    # the reference's measured train time at ours' measured sec/step
    with open(os.path.join(args.workdir, "ref_result.json")) as f:
        ref = json.load(f)
    with open(os.path.join(args.workdir, "ours_result.json")) as f:
        ours = json.load(f)
    sec_per_epoch = ours["sec_per_step"] * ours["steps_per_epoch"]
    eq_epochs = max(int(ref["train_seconds"] // sec_per_epoch), 1)
    if eq_epochs != args.epochs:
        print(f"=== phase ours (equal wall clock: {eq_epochs} epochs ~ "
              f"{ref['train_seconds']}s) ===", flush=True)
        eq = [a for a in base if a not in ("--epochs", str(args.epochs))]
        subprocess.run(
            eq[:2] + ["ours"] + eq[2:] + [
                "--epochs", str(eq_epochs), "--tag", "equal_time",
                "--note",
                f"equal wall clock: {eq_epochs} epochs chosen to fit the "
                f"reference's measured {ref['train_seconds']}s",
            ],
            check=True, timeout=3 * 3600,
        )
    if not args.skip_ref_objective:
        # the reference's LITERAL objective through our stack (4th row)
        print("=== phase ours (reference objective) ===", flush=True)
        ro = [a for a in base if a not in ("--objective", "production")]
        subprocess.run(
            ro[:2] + ["ours"] + ro[2:] + ["--objective", "reference"],
            check=True, timeout=3600,
        )
    print("=== phase report ===", flush=True)
    subprocess.run(base[:2] + ["report"] + base[2:], check=True,
                   timeout=300)


def phase_suite(args):
    """The round-5 protocol (VERDICT r4 next-steps 2+3): the r4 plane
    scene (continuity row) plus the multi-object scene at THREE seeds,
    each through the full 4-row phase_all protocol (reference / ours /
    equal-wall-clock / reference-objective) with pose rows, merged into
    one benchmarks/REFLOOP.json."""
    script = os.path.abspath(__file__)
    runs = [("plane", 42, "plane")] + [
        (f"mo_s{s}", s, "multiobject") for s in (1, 2, 3)
    ]
    merged = {"protocol_version": 2, "runs": {}}
    for name, seed, scene in runs:
        workdir = f"{args.workdir}_{name}"
        out = os.path.join(workdir, "report.json")
        cmd = [
            sys.executable, script, "all",
            "--root", args.root, "--workdir", workdir,
            "--height", str(args.height), "--width", str(args.width),
            "--focal", str(args.focal), "--depth", str(args.depth),
            "--tx", str(args.tx), "--slant-deg", str(args.slant_deg),
            "--frames", str(args.frames), "--epochs", str(args.epochs),
            "--lr", str(args.lr), "--backend", args.backend,
            "--scene", scene, "--seed", str(seed),
            "--n-objects", str(args.n_objects),
            "--ref-timeout", str(args.ref_timeout),
            "--out", out,
        ]
        if args.merge_only and os.path.exists(out):
            print(f"===== suite run {name}: reusing existing {out} =====",
                  flush=True)
        else:
            print(f"===== suite run {name} (scene={scene}, seed={seed}) "
                  "=====", flush=True)
            subprocess.run(cmd, check=True, timeout=4 * 3600)
        with open(out) as f:
            merged["runs"][name] = json.load(f)

    # aggregate the multi-object seeds: mean / min / max per row+metric,
    # and the all-seeds win verdicts the protocol is for
    mo = [merged["runs"][f"mo_s{s}"] for s in (1, 2, 3)]

    def agg(row, metric):
        vals = [r[row]["eval"][metric] for r in mo if row in r]
        return {
            "mean": round(float(np.mean(vals)), 4),
            "min": round(float(np.min(vals)), 4),
            "max": round(float(np.max(vals)), 4),
        }

    rows = ("reference", "ours", "ours_equal_time",
            "ours_reference_objective")
    merged["multiobject_aggregate"] = {
        row: {m: agg(row, m) for m in ("abs_rel", "sq_rel", "rmse", "a1")}
        for row in rows
        if all(row in r for r in mo)
    }
    def wins(row_key, metric, higher_better=False):
        out = []
        for r in mo:
            row = r.get(row_key, r["ours"])
            a, b = row["eval"][metric], r["reference"]["eval"][metric]
            out.append(a > b if higher_better else a < b)
        return out

    merged["ours_beats_reference_per_seed"] = {
        "equal_steps": {
            m: wins("ours", m, higher_better=(m == "a1"))
            for m in ("abs_rel", "sq_rel", "rmse", "a1")
        },
        "equal_wall_clock": {
            m: wins("ours_equal_time", m, higher_better=(m == "a1"))
            for m in ("abs_rel", "sq_rel", "rmse", "a1")
        },
    }
    merged["ours_beats_reference_all_seeds"] = {
        "equal_steps": all(
            r["ours"]["eval"]["abs_rel"] < r["reference"]["eval"]["abs_rel"]
            and r["ours"]["eval"]["a1"] > r["reference"]["eval"]["a1"]
            for r in mo
        ),
        "equal_wall_clock": all(
            r.get("ours_equal_time", r["ours"])["eval"]["abs_rel"]
            < r["reference"]["eval"]["abs_rel"]
            for r in mo
        ),
        "pose_ate": all(
            r["ours"]["pose"]["ate_m"] <= r["reference"]["pose"]["ate_m"]
            for r in mo
            if "pose" in r.get("ours", {}) and "pose" in r.get("reference", {})
        ),
    }
    out = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "REFLOOP.json"
    )
    with open(out, "w") as f:
        json.dump(merged, f, indent=2)
    print(f"suite report -> {out}")
    print(json.dumps(merged["ours_beats_reference_all_seeds"], indent=2))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("phase", choices=("tree", "ref", "ours", "report",
                                          "all", "suite"))
    parser.add_argument("--root", default="/tmp/refloop_kitt",
                        help="tree root; MUST be 17 chars (see module doc)")
    parser.add_argument("--workdir", default="/tmp/refloop_work")
    parser.add_argument("--height", type=int, default=128)
    parser.add_argument("--width", type=int, default=416)
    parser.add_argument("--focal", type=float, default=180.0)
    parser.add_argument("--depth", type=float, default=10.0)
    parser.add_argument("--tx", type=float, default=0.15)
    parser.add_argument("--slant-deg", type=float, default=35.0)
    parser.add_argument("--frames", type=int, default=34,
                        help="frames per training drive (2 drives)")
    parser.add_argument("--epochs", type=int, default=25)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--ref-timeout", type=int, default=5400)
    parser.add_argument("--objective", default="production",
                        choices=("production", "reference"),
                        help="'production' = the objective this framework "
                        "ships (min+automask, disp smoothness 1e-3); "
                        "'reference' = the reference's literal objective "
                        "(mean L1 + unweighted depth smoothness), which "
                        "collapses to the zeros-warp trivial solution on "
                        "this scene (negative-result row)")
    parser.add_argument("--backend", default="auto", choices=("auto", "cpu"),
                        help="'cpu' forces the ours phase off the TPU "
                        "(tests; the axon plugin ignores JAX_PLATFORMS)")
    parser.add_argument("--out", default="",
                        help="report path (default benchmarks/REFLOOP.json)")
    parser.add_argument("--tag", default="",
                        help="result-file tag for extra ours rows (e.g. "
                        "'equal_time' -> ours_result_equal_time.json)")
    parser.add_argument("--note", default="",
                        help="protocol note recorded with a tagged row")
    parser.add_argument("--scene", default="plane",
                        choices=("plane", "multiobject"),
                        help="'plane' = the r3/r4 slanted-plane world; "
                        "'multiobject' = ground plane + static textured "
                        "billboards at distinct depths (depth "
                        "discontinuities + occlusion)")
    parser.add_argument("--n-objects", type=int, default=3)
    parser.add_argument("--seed", type=int, default=42,
                        help="run seed: offsets the scene-texture/geometry "
                        "seeds and both stacks' training seeds")
    parser.add_argument("--skip-ref-objective", action="store_true",
                        help="phase_all: skip the ours-with-reference-"
                        "objective row")
    parser.add_argument("--merge-only", action="store_true",
                        help="suite: reuse each run's existing report.json "
                        "instead of re-running it (re-merge after an "
                        "aggregate-logic change)")
    args = parser.parse_args()
    os.makedirs(args.workdir, exist_ok=True)
    {"tree": phase_tree, "ref": phase_ref, "ours": phase_ours,
     "report": phase_report, "all": phase_all,
     "suite": phase_suite}[args.phase](args)


if __name__ == "__main__":
    main()
