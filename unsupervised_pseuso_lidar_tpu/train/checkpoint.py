"""Checkpointing: orbax save/restore + PyTorch state-dict interop.

Capability parity with /root/reference/trainer.py:129-152 (per-epoch
checkpoint of {epoch, dpth_mdl_state_dict, pose_mdl_state_dict,
optimizer_state_dict}) — stored as orbax pytree checkpoints — plus the
torch<->flax converter the north star requires for sfm.pth-style
checkpoint compatibility (SURVEY.md §7 "checkpoint importer").

The torch mapping covers the model zoo's reference state-dict schemas:
  * DispResNet:  encoder.encoder.<torchvision resnet18> +
                 decoder.decoder.<ModuleList index>  (resnet_dispnet.py)
  * DispNetS:    conv{1-7}.{0,2,3} / upconv{1-7}.0 / iconv{1-7}.0 /
                 predict_disp{1-4}.0  (disp_net.py)
  * StnDispNet:  conv{1-4}.{0,1,3,4} / upconv_{1-4}.{0,1} / predict.0
                 (+ localization/fc_loc when the STN branch is enabled)
                 (stn_depth_net.py)
  * PoseNet/PoseFc: conv{1-7}.0 + pose_pred (+ fc_loc.{0,2,4})
                 (pose_net.py, pose_fc.py)

Tensor layout conversions: conv OIHW->HWIO, conv-transpose (in,out,kh,kw)
-> (kh,kw,in,out), linear (out,in) -> (in,out); BatchNorm weight/bias ->
scale/bias params and running stats -> batch_stats. The PoseFc flatten
order differs (reference flattens CHW, pose_fc.py:80; we flatten HWC) so
the first fc_loc matrix rows are permuted accordingly.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


# ---------------------------------------------------------------------------
# orbax persistence
# ---------------------------------------------------------------------------


class CheckpointManager:
    """Per-epoch orbax checkpoints under <directory>/epoch_<n>."""

    def __init__(self, directory: str):
        import orbax.checkpoint as ocp

        self.directory = os.path.abspath(directory)
        self._ckptr = ocp.StandardCheckpointer()

    def _epoch_path(self, epoch: int) -> str:
        return os.path.join(self.directory, f"epoch_{epoch:05d}")

    def latest_epoch(self) -> Optional[int]:
        if not os.path.isdir(self.directory):
            return None
        epochs = []
        for name in os.listdir(self.directory):
            m = re.fullmatch(r"epoch_(\d+)", name)
            if m:
                epochs.append(int(m.group(1)))
        return max(epochs) if epochs else None

    def save(self, state: Any, epoch: int) -> str:
        os.makedirs(self.directory, exist_ok=True)
        path = self._epoch_path(epoch)
        self._ckptr.save(path, jax.device_get(state), force=True)
        self._ckptr.wait_until_finished()
        return path

    def restore(self, template: Any, epoch: Optional[int] = None
                ) -> Optional[Tuple[Any, int]]:
        if epoch is None:
            epoch = self.latest_epoch()
        if epoch is None:
            return None
        state = self._ckptr.restore(self._epoch_path(epoch), template)
        return state, epoch


# ---------------------------------------------------------------------------
# torch <-> flax tensor conversions
# ---------------------------------------------------------------------------


def _t2f_conv(w: np.ndarray) -> np.ndarray:  # OIHW -> HWIO
    return np.transpose(w, (2, 3, 1, 0))


def _f2t_conv(w: np.ndarray) -> np.ndarray:  # HWIO -> OIHW
    return np.transpose(w, (3, 2, 0, 1))


def _t2f_convT(w: np.ndarray) -> np.ndarray:  # (in,out,kh,kw) -> (kh,kw,in,out)
    return np.transpose(w, (2, 3, 0, 1))


def _f2t_convT(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 0, 1))


def _t2f_linear(w: np.ndarray) -> np.ndarray:  # (out,in) -> (in,out)
    return np.transpose(w)


_f2t_linear = _t2f_linear


def chw_to_hwc_permutation(channels: int, height: int, width: int) -> np.ndarray:
    """Index permutation p with p[hwc_index] = chw_index for a flattened
    feature map — used to remap FC input columns between torch's CHW
    flatten and our HWC flatten."""
    idx = np.arange(channels * height * width).reshape(channels, height, width)
    return np.transpose(idx, (1, 2, 0)).reshape(-1)


# ---------------------------------------------------------------------------
# mapping tables: flax param path -> (torch prefix, kind)
# kind: conv | convT | linear | bn (expands to scale/bias + stats)
# ---------------------------------------------------------------------------


def _detect_resnet_shape(
    torch_state: Optional[Dict[str, Any]],
) -> Tuple[Tuple[int, ...], bool]:
    """(blocks per layer, is_bottleneck) from a DispResNet-schema torch
    state dict; defaults to resnet18 when no state is given (the
    reference's model of record)."""
    if not torch_state:
        return (2, 2, 2, 2), False
    import re

    blocks = [0, 0, 0, 0]
    bottleneck = False
    for key in torch_state:
        match = re.search(r"encoder\.layer([1-4])\.(\d+)\.", key)
        if match:
            layer, b = int(match.group(1)), int(match.group(2))
            blocks[layer - 1] = max(blocks[layer - 1], b + 1)
            if ".conv3." in key:
                bottleneck = True
    if not all(blocks):
        return (2, 2, 2, 2), False
    return tuple(blocks), bottleneck


def _detect_resnet_shape_from_params(params: Any) -> Tuple[Tuple[int, ...], bool]:
    """(blocks per layer, is_bottleneck) from DispResNet FLAX params —
    the export direction, where no torch state exists yet. The total
    block count + block type identify the depth uniquely."""
    enc = params.get("ResnetEncoder_0", {}) if hasattr(params, "get") else {}
    names = list(enc)
    bottleneck = any(n.startswith("Bottleneck_") for n in names)
    prefix = "Bottleneck_" if bottleneck else "BasicBlock_"
    count = sum(1 for n in names if n.startswith(prefix))
    depth_by_count = {
        (8, False): 18, (16, False): 34,
        (16, True): 50, (33, True): 101, (50, True): 152,
    }
    from unsupervised_pseuso_lidar_tpu.models.depth.resnet_dispnet import (
        RESNET_STAGE_BLOCKS,
    )

    if (count, bottleneck) not in depth_by_count:
        # a partial/unknown tree must fail loudly — defaulting would
        # export a truncated state dict that breaks far from the cause
        raise ValueError(
            f"Unrecognized DispResNet encoder: {count} "
            f"{'bottleneck' if bottleneck else 'basic'} blocks"
        )
    depth = depth_by_count[(count, bottleneck)]
    return RESNET_STAGE_BLOCKS[depth], bottleneck


def _dispresnet_mapping(
    torch_state: Optional[Dict[str, Any]] = None,
    shape: Optional[Tuple[Tuple[int, ...], bool]] = None,
) -> Dict[str, Tuple[str, str]]:
    m: Dict[str, Tuple[str, str]] = {}
    enc = "ResnetEncoder_0"
    m[f"{enc}/TorchConv_0"] = ("encoder.encoder.conv1", "conv")
    m[f"{enc}/BatchNorm_0"] = ("encoder.encoder.bn1", "bn")
    # resnet blocks: flax {BasicBlock,Bottleneck}_{n} in creation order;
    # block counts + type inferred from the torch state (resnet18/34
    # basic, 50/101/152 bottleneck), or passed explicitly (export path)
    stage_blocks, bottleneck = shape or _detect_resnet_shape(torch_state)
    block_name = "Bottleneck" if bottleneck else "BasicBlock"
    n_convs = 3 if bottleneck else 2
    expansion = 4 if bottleneck else 1
    block = 0
    in_ch = 64
    for layer, blocks in enumerate(stage_blocks, start=1):
        out_ch = 64 * (2 ** (layer - 1)) * expansion
        for b in range(blocks):
            t = f"encoder.encoder.layer{layer}.{b}"
            f = f"{enc}/{block_name}_{block}"
            for ci in range(n_convs):
                m[f"{f}/TorchConv_{ci}"] = (f"{t}.conv{ci + 1}", "conv")
                m[f"{f}/BatchNorm_{ci}"] = (f"{t}.bn{ci + 1}", "bn")
            stride = 2 if (layer > 1 and b == 0) else 1
            if b == 0 and (stride != 1 or in_ch != out_ch):
                # projection branch (torchvision creates it under the
                # same stride/width condition our blocks use)
                m[f"{f}/TorchConv_{n_convs}"] = (f"{t}.downsample.0", "conv")
                m[f"{f}/BatchNorm_{n_convs}"] = (f"{t}.downsample.1", "bn")
            block += 1
        in_ch = out_ch
    dec = "DepthDecoder_0"
    # upconv(i, j) -> ModuleList index 2*(4-i)+j ; ConvBlock_m wraps Conv3x3_0
    for i in range(4, -1, -1):
        for j in range(2):
            idx = 2 * (4 - i) + j
            m[f"{dec}/ConvBlock_{idx}/Conv3x3_0"] = (
                f"decoder.decoder.{idx}.conv.conv", "conv"
            )
    # dispconv scale s -> ModuleList index 10+s ; flax Conv3x3_{3-s}
    for s in range(4):
        m[f"{dec}/Conv3x3_{3 - s}"] = (f"decoder.decoder.{10 + s}.conv", "conv")
    return m


def _dispnets_mapping() -> Dict[str, Tuple[str, str]]:
    m: Dict[str, Tuple[str, str]] = {}
    for i in range(7):
        f = f"DownsampleConvBN_{i}"
        m[f"{f}/TorchConv_0"] = (f"conv{i + 1}.0", "conv")
        m[f"{f}/BatchNorm_0"] = (f"conv{i + 1}.2", "bn")
        m[f"{f}/TorchConv_1"] = (f"conv{i + 1}.3", "conv")
    # decoder creation order (see models/depth/dispnet.py __call__):
    # TCT_0..3 = upconv7..4, TC_0..3 = iconv7..4, TC_4 = disp4,
    # TCT_4..6 = upconv3..1, TC_5/7/9 = iconv3/2/1, TC_6/8/10 = disp3/2/1
    m["TorchConvTranspose_0"] = ("upconv7.0", "convT")
    m["TorchConv_0"] = ("iconv7.0", "conv")
    m["TorchConvTranspose_1"] = ("upconv6.0", "convT")
    m["TorchConv_1"] = ("iconv6.0", "conv")
    m["TorchConvTranspose_2"] = ("upconv5.0", "convT")
    m["TorchConv_2"] = ("iconv5.0", "conv")
    m["TorchConvTranspose_3"] = ("upconv4.0", "convT")
    m["TorchConv_3"] = ("iconv4.0", "conv")
    m["TorchConv_4"] = ("predict_disp4.0", "conv")
    m["TorchConvTranspose_4"] = ("upconv3.0", "convT")
    m["TorchConv_5"] = ("iconv3.0", "conv")
    m["TorchConv_6"] = ("predict_disp3.0", "conv")
    m["TorchConvTranspose_5"] = ("upconv2.0", "convT")
    m["TorchConv_7"] = ("iconv2.0", "conv")
    m["TorchConv_8"] = ("predict_disp2.0", "conv")
    m["TorchConvTranspose_6"] = ("upconv1.0", "convT")
    m["TorchConv_9"] = ("iconv1.0", "conv")
    m["TorchConv_10"] = ("predict_disp1.0", "conv")
    return m


def _pose_trunk_mapping() -> Dict[str, Tuple[str, str]]:
    m: Dict[str, Tuple[str, str]] = {}
    for i in range(7):
        m[f"TorchConv_{i}"] = (f"conv{i + 1}.0", "conv")
    m["TorchConv_7"] = ("pose_pred", "conv")
    return m


def _posefc_mapping() -> Dict[str, Tuple[str, str]]:
    m = _pose_trunk_mapping()
    # linear_chw:<C> = flatten-permuted linear (torch flattened CHW with C
    # channels; we flatten HWC). The conv feeding this FC has 12 output
    # channels (pose_fc.py:36,80).
    m["Dense_0"] = ("fc_loc.0", "linear_chw:12")
    m["Dense_1"] = ("fc_loc.2", "linear")
    m["Dense_2"] = ("fc_loc.4", "linear")
    return m


def _stndispnet_mapping(
    use_stn: bool = False, torch_stn: Optional[bool] = None
) -> Dict[str, Tuple[str, str]]:
    """StnDispNet <-> reference stn_depth_net.py state dict
    (/root/reference/models/depth/stn_depth_net.py:41-77): conv{1-4} =
    Sequential(Conv, GroupNorm, ReLU, Conv, GroupNorm, ReLU), upconv_{1-4}
    = Sequential(ConvTranspose, GroupNorm, ReLU), predict.0, plus
    localization.{0-4}.* and fc_loc.{0,2,4,6}.

    `use_stn` = the FLAX side holds STN parameters (scope order follows
    models/depth/stn_dispnet.py __call__: the 5 localization blocks and
    4 Dense layers are created before the encoder blocks). `torch_stn` =
    the torch side has them. The reference registers the STN modules
    unconditionally while its forward never calls them
    (stn_depth_net.py:58-77,107-108), so real reference checkpoints
    always carry the keys; importing one into a use_stn=False model maps
    only the live subgraph and ignores the dead branch."""
    torch_stn = use_stn if torch_stn is None else torch_stn
    m: Dict[str, Tuple[str, str]] = {}

    def gn_block(f: str, t: str) -> None:
        m[f"{f}/TorchConv_0"] = (f"{t}.0", "conv")
        m[f"{f}/GroupNorm_0"] = (f"{t}.1", "gn")
        m[f"{f}/TorchConv_1"] = (f"{t}.3", "conv")
        m[f"{f}/GroupNorm_1"] = (f"{t}.4", "gn")

    enc_base = 0
    if use_stn:
        enc_base = 5
        if torch_stn:
            for j in range(5):
                gn_block(f"DownsampleConvGN_{j}", f"localization.{j}")
            # reference flattens CHW from a 32-channel map
            # (view(-1, 32*12*40), stn_depth_net.py:83); we flatten HWC
            m["Dense_0"] = ("fc_loc.0", "linear_chw:32")
            m["Dense_1"] = ("fc_loc.2", "linear")
            m["Dense_2"] = ("fc_loc.4", "linear")
            m["Dense_3"] = ("fc_loc.6", "linear")
    for i in range(4):
        gn_block(f"DownsampleConvGN_{enc_base + i}", f"conv{i + 1}")
    for i in range(4):
        m[f"UpconvGN_{i}/TorchConvTranspose_0"] = (f"upconv_{i + 1}.0", "convT")
        m[f"UpconvGN_{i}/GroupNorm_0"] = (f"upconv_{i + 1}.1", "gn")
    m["TorchConv_0"] = ("predict.0", "conv")
    return m


def _stn_branch_identity_state() -> Dict[str, np.ndarray]:
    """Synthesized STN-branch tensors for exporting a use_stn=False
    StnDispNet: the reference registers localization/fc_loc regardless
    of use, so its state dicts (and parameters()) always include them —
    a strict torch load of our export needs the keys. Values encode the
    IDENTITY transform (zero weights, fc_loc.6 bias = [1,0,0,0,1,0],
    the reference's own init, stn_depth_net.py:104-105) so the branch
    is a no-op even if re-enabled."""
    out: Dict[str, np.ndarray] = {}
    chans = [(3, 16), (16, 32), (32, 32), (32, 32), (32, 32)]
    for j, (cin, cout) in enumerate(chans):
        t = f"localization.{j}"
        out[f"{t}.0.weight"] = np.zeros((cout, cin, 3, 3), np.float32)
        out[f"{t}.0.bias"] = np.zeros((cout,), np.float32)
        out[f"{t}.1.weight"] = np.ones((cout,), np.float32)
        out[f"{t}.1.bias"] = np.zeros((cout,), np.float32)
        out[f"{t}.3.weight"] = np.zeros((cout, cout, 3, 3), np.float32)
        out[f"{t}.3.bias"] = np.zeros((cout,), np.float32)
        out[f"{t}.4.weight"] = np.ones((cout,), np.float32)
        out[f"{t}.4.bias"] = np.zeros((cout,), np.float32)
    # fc_loc: Linear(32*12*40, 1280) -> 256 -> 128 -> 6
    # (stn_depth_net.py:68-77)
    for cin, cout, idx in ((15360, 1280, 0), (1280, 256, 2),
                           (256, 128, 4), (128, 6, 6)):
        out[f"fc_loc.{idx}.weight"] = np.zeros((cout, cin), np.float32)
        out[f"fc_loc.{idx}.bias"] = np.zeros((cout,), np.float32)
    out["fc_loc.6.bias"] = np.array([1, 0, 0, 0, 1, 0], np.float32)
    return out


def _bts_mapping() -> Dict[str, Tuple[str, str]]:
    """BtsModel <-> reference BTS state dict
    (/root/reference/pseudo-lidar/utils/model.py; encoder keys follow
    torchvision densenet161.features naming under encoder.base_model)."""
    m: Dict[str, Tuple[str, str]] = {}
    enc = "DenseNet161Encoder_0"
    te = "encoder.base_model"
    m[f"{enc}/TorchConv_0"] = (f"{te}.conv0", "conv")
    m[f"{enc}/_BN_0/BatchNorm_0"] = (f"{te}.norm0", "bn")
    blocks = (6, 12, 36, 24)
    layer_idx = 0
    bn_idx = 1
    conv_idx = 1
    for b, num_layers in enumerate(blocks):
        for l in range(num_layers):
            t = f"{te}.denseblock{b + 1}.denselayer{l + 1}"
            f = f"{enc}/DenseLayer_{layer_idx}"
            m[f"{f}/_BN_0/BatchNorm_0"] = (f"{t}.norm1", "bn")
            m[f"{f}/TorchConv_0"] = (f"{t}.conv1", "conv")
            m[f"{f}/_BN_1/BatchNorm_0"] = (f"{t}.norm2", "bn")
            m[f"{f}/TorchConv_1"] = (f"{t}.conv2", "conv")
            layer_idx += 1
        if b < 3:
            t = f"{te}.transition{b + 1}"
            m[f"{enc}/_BN_{bn_idx}/BatchNorm_0"] = (f"{t}.norm", "bn")
            m[f"{enc}/TorchConv_{conv_idx}"] = (f"{t}.conv", "conv")
            bn_idx += 1
            conv_idx += 1
    m[f"{enc}/_BN_{bn_idx}/BatchNorm_0"] = (f"{te}.norm5", "bn")

    dec = "BtsDecoder_0"
    td = "decoder"

    def upconv(fi, tname):
        m[f"{dec}/UpConv_{fi}/TorchConv_0"] = (f"{td}.{tname}.conv", "conv")

    def bn(fi, tname):
        m[f"{dec}/_BN_{fi}/BatchNorm_0"] = (f"{td}.{tname}", "bn")

    def conv(fi, tname):
        m[f"{dec}/TorchConv_{fi}"] = (f"{td}.{tname}", "conv")

    def atrous(fi, tname, bn_first):
        f = f"{dec}/AtrousConv_{fi}"
        t = f"{td}.{tname}.atrous_conv"
        if bn_first:
            m[f"{f}/_BN_0/BatchNorm_0"] = (f"{t}.first_bn", "bn")
            inner_bn = "_BN_1"
        else:
            inner_bn = "_BN_0"
        m[f"{f}/TorchConv_0"] = (f"{t}.aconv_sequence.1", "conv")
        m[f"{f}/{inner_bn}/BatchNorm_0"] = (f"{t}.aconv_sequence.2", "bn")
        m[f"{f}/Conv_0"] = (f"{t}.aconv_sequence.4", "conv")

    def reduction(fi, tname, num_in, num_out, is_final):
        f = f"{dec}/Reduction1x1_{fi}"
        t = f"{td}.{tname}.reduc"
        width = num_out
        ci = 0
        cin = num_in
        while width >= 4:
            if width < 8:
                if is_final:
                    m[f"{f}/TorchConv_{ci}"] = (f"{t}.final.0", "conv")
                else:
                    m[f"{f}/TorchConv_{ci}"] = (f"{t}.plane_params", "conv")
                break
            m[f"{f}/TorchConv_{ci}"] = (f"{t}.inter_{cin}_{width}.0", "conv")
            cin = width
            width //= 2
            ci += 1

    nf = 512
    upconv(0, "upconv5"); bn(0, "bn5"); conv(0, "conv5.0")
    upconv(1, "upconv4"); bn(1, "bn4"); conv(1, "conv4.0"); bn(2, "bn4_2")
    atrous(0, "daspp_3", bn_first=False)
    atrous(1, "daspp_6", bn_first=True)
    atrous(2, "daspp_12", bn_first=True)
    atrous(3, "daspp_18", bn_first=True)
    atrous(4, "daspp_24", bn_first=True)
    conv(2, "daspp_conv.0")
    reduction(0, "reduc8x8", nf // 4, nf // 4, False)
    upconv(2, "upconv3"); bn(3, "bn3"); conv(3, "conv3.0")
    reduction(1, "reduc4x4", nf // 4, nf // 8, False)
    upconv(3, "upconv2"); bn(4, "bn2"); conv(4, "conv2.0")
    reduction(2, "reduc2x2", nf // 8, nf // 16, False)
    upconv(4, "upconv1")
    reduction(3, "reduc1x1", nf // 16, nf // 32, True)
    conv(5, "conv1.0")
    conv(6, "get_depth.0")
    return m


MODEL_MAPPINGS = {
    "DispResNet": _dispresnet_mapping,
    "DispNetS": _dispnets_mapping,
    "StnDispNet": _stndispnet_mapping,
    "PoseNet": _pose_trunk_mapping,
    "PoseFc": _posefc_mapping,
    "BtsModel": _bts_mapping,
}


def _strip_module_prefix(torch_state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Drop the DataParallel 'module.' prefix (the reference wraps its BTS
    model purely for key compat, /root/reference/pseudo-lidar/DepthPipeline.py:122)."""
    return {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in torch_state.items()
    }


def _get_path(tree: Any, path: str) -> Any:
    node = tree
    for part in path.split("/"):
        node = node[part]
    return node


def _to_numpy_state(torch_state: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """torch tensors / numpy -> numpy, with DataParallel prefix stripped."""
    return _strip_module_prefix(
        {
            k: np.asarray(getattr(v, "numpy", lambda: v)())
            for k, v in torch_state.items()
        }
    )


def _to_plain_trees(flax_params: Any, flax_batch_stats: Any) -> Tuple[Any, Any]:
    params = jax.tree.map(np.asarray, jax.device_get(flax_params))
    batch_stats = jax.tree.map(np.asarray, jax.device_get(flax_batch_stats))

    def to_plain(d):
        if hasattr(d, "unfreeze"):
            d = d.unfreeze()
        return {
            k: to_plain(v) if isinstance(v, dict) else v
            for k, v in dict(d).items()
        }

    return to_plain(params), to_plain(batch_stats)


def import_torch_state(
    flax_params: Any,
    flax_batch_stats: Any,
    torch_state: Dict[str, np.ndarray],
    model_name: str,
) -> Tuple[Any, Any]:
    """Convert a reference-schema torch state dict into (params,
    batch_stats) pytrees matching our flax modules.

    Accepts numpy arrays or torch tensors as values.
    """
    if model_name not in MODEL_MAPPINGS:
        raise KeyError(f"No torch mapping for model '{model_name}'")
    torch_state = _to_numpy_state(torch_state)
    if model_name == "DispResNet":
        # block counts + type (basic/bottleneck) vary with num_layers
        mapping = _dispresnet_mapping(torch_state)
    elif model_name == "StnDispNet":
        use_stn = "Dense_0" in flax_params
        torch_stn = "fc_loc.0.weight" in torch_state
        if use_stn and torch_stn and (
            int(flax_params["Dense_0"]["kernel"].shape[0])
            != int(torch_state["fc_loc.0.weight"].shape[1])
        ):
            # the reference STN head is a FIXED-resolution Linear
            # (32*12*40 at its 384x1280 size, stn_depth_net.py:69); at any
            # other resolution the flatten widths disagree — leave the
            # branch at its (identity) init rather than corrupt it
            print(
                "warning: STN branch not imported "
                "(resolution-fixed fc_loc flatten mismatch)"
            )
            torch_stn = False
        mapping = _stndispnet_mapping(use_stn=use_stn, torch_stn=torch_stn)
    else:
        mapping = MODEL_MAPPINGS[model_name]()
    params, batch_stats = _to_plain_trees(flax_params, flax_batch_stats)
    return _apply_mapping(params, batch_stats, torch_state, mapping)


def _apply_mapping(
    params: Any,
    batch_stats: Any,
    torch_state: Dict[str, np.ndarray],
    mapping: Dict[str, Tuple[str, str]],
) -> Tuple[Any, Any]:
    for flax_path, (torch_prefix, kind) in mapping.items():
        if kind == "conv":
            weight = _t2f_conv(torch_state[f"{torch_prefix}.weight"])
            leaf = _get_path(params, flax_path)
            # TorchConv wraps nn.Conv as Conv_0; Conv3x3 likewise.
            inner = "Conv_0" if "Conv_0" in leaf else None
            target = leaf[inner] if inner else leaf
            target["kernel"] = weight.astype(target["kernel"].dtype)
            if f"{torch_prefix}.bias" in torch_state:
                target["bias"] = torch_state[f"{torch_prefix}.bias"].astype(
                    target["bias"].dtype
                )
        elif kind == "convT":
            leaf = _get_path(params, flax_path)
            leaf["kernel"] = _t2f_convT(
                torch_state[f"{torch_prefix}.weight"]
            ).astype(leaf["kernel"].dtype)
            if f"{torch_prefix}.bias" in torch_state:
                leaf["bias"] = torch_state[f"{torch_prefix}.bias"].astype(
                    leaf["bias"].dtype
                )
        elif kind.startswith("linear"):
            leaf = _get_path(params, flax_path)
            weight = _t2f_linear(torch_state[f"{torch_prefix}.weight"])
            if kind.startswith("linear_chw"):
                # torch flattened CHW with <C> channels; we flatten HWC.
                # The permutation only needs the (C, H*W) split — it is
                # independent of the H/W factorization.
                channels = int(kind.split(":", 1)[1])
                hw = weight.shape[0] // channels
                perm = chw_to_hwc_permutation(channels, 1, hw)
                weight = weight[perm]
            leaf["kernel"] = weight.astype(leaf["kernel"].dtype)
            leaf["bias"] = torch_state[f"{torch_prefix}.bias"].astype(
                leaf["bias"].dtype
            )
        elif kind == "gn":
            # GroupNorm: affine params only, no running stats
            leaf = _get_path(params, flax_path)
            leaf["scale"] = torch_state[f"{torch_prefix}.weight"].astype(
                leaf["scale"].dtype
            )
            leaf["bias"] = torch_state[f"{torch_prefix}.bias"].astype(
                leaf["bias"].dtype
            )
        elif kind == "bn":
            leaf = _get_path(params, flax_path)
            leaf["scale"] = torch_state[f"{torch_prefix}.weight"].astype(
                leaf["scale"].dtype
            )
            leaf["bias"] = torch_state[f"{torch_prefix}.bias"].astype(
                leaf["bias"].dtype
            )
            stats = _get_path(batch_stats, flax_path)
            stats["mean"] = torch_state[f"{torch_prefix}.running_mean"].astype(
                stats["mean"].dtype
            )
            stats["var"] = torch_state[f"{torch_prefix}.running_var"].astype(
                stats["var"].dtype
            )
        else:
            raise ValueError(kind)
    return params, batch_stats


# ---------------------------------------------------------------------------
# pretrained depth-encoder initialization (config: model.depth.pretrained_path)
# ---------------------------------------------------------------------------


def _encoder_only_mapping(
    torch_state: Optional[Dict[str, Any]] = None,
) -> Dict[str, Tuple[str, str]]:
    """DispResNet mapping restricted to the ResNet encoder."""
    return {
        k: v
        for k, v in _dispresnet_mapping(torch_state).items()
        if k.startswith("ResnetEncoder_0")
    }


def normalize_depth_pretrained_state(
    torch_state: Dict[str, Any],
) -> Tuple[Dict[str, np.ndarray], bool]:
    """Normalize any supported pretrained-depth blob to the reference
    DispResNet state-dict schema.

    Accepts (the reference trains from ResnetEncoder(18, pretrained=True),
    /root/reference/models/depth/resnet_dispnet.py:30):
      * a full reference checkpoint dict ({epoch, dpth_mdl_state_dict, ...},
        /root/reference/trainer.py:132-137) — uses dpth_mdl_state_dict;
      * a DispResNet state dict (encoder.encoder.* + decoder.decoder.*);
      * a raw torchvision resnet18 state dict (conv1.weight, layer1.* ...,
        i.e. torch.hub's ImageNet weights) — encoder-only.
    Returns (state in DispResNet schema, encoder_only).
    """
    if "dpth_mdl_state_dict" in torch_state:
        torch_state = torch_state["dpth_mdl_state_dict"]
    state = _to_numpy_state(dict(torch_state))
    if any(k.startswith("encoder.") for k in state):
        return state, False
    if "conv1.weight" in state and "layer1.0.conv1.weight" in state:
        return (
            {
                f"encoder.encoder.{k}": v
                for k, v in state.items()
                if not k.startswith("fc.")  # classifier head: no counterpart
            },
            True,
        )
    raise KeyError(
        "Unrecognized pretrained depth state dict: expected a reference "
        "checkpoint (dpth_mdl_state_dict), a DispResNet state dict "
        "(encoder.encoder.*), or a torchvision resnet state dict "
        "(conv1.weight / layer1.*)"
    )


def import_pretrained_depth(
    flax_params: Any,
    flax_batch_stats: Any,
    torch_state: Dict[str, Any],
) -> Tuple[Any, Any]:
    """Initialize DispResNet variables from a pretrained torch blob.

    Encoder-only blobs (ImageNet torchvision weights) leave the decoder at
    its random init — exactly the reference's training-from-ImageNet setup.
    """
    state, encoder_only = normalize_depth_pretrained_state(torch_state)
    mapping = (
        _encoder_only_mapping(state) if encoder_only
        else _dispresnet_mapping(state)
    )
    params, batch_stats = _to_plain_trees(flax_params, flax_batch_stats)
    return _apply_mapping(params, batch_stats, state, mapping)


def load_pretrained_depth(
    flax_params: Any, flax_batch_stats: Any, path: str
) -> Tuple[Any, Any]:
    """Load + import a pretrained depth init from disk (.pth via torch,
    .npz via numpy for torch-free environments)."""
    if path.endswith(".npz"):
        blob: Dict[str, Any] = dict(np.load(path))
    else:
        blob = load_torch_checkpoint(path)
    return import_pretrained_depth(flax_params, flax_batch_stats, blob)


def load_pretrained_pose(
    flax_params: Any, flax_batch_stats: Any, path: str, model_name: str
) -> Tuple[Any, Any]:
    """Load + import a pretrained pose init from disk, symmetric with
    load_pretrained_depth. Accepts a full reference checkpoint
    ({epoch, pose_mdl_state_dict, ...}, /root/reference/trainer.py:132-137)
    or a bare pose state dict in the reference schema for `model_name`
    (PoseNet / PoseFc / any MODEL_MAPPINGS entry)."""
    if path.endswith(".npz"):
        blob: Dict[str, Any] = dict(np.load(path))
    else:
        blob = load_torch_checkpoint(path)
    if "pose_mdl_state_dict" in blob:
        blob = blob["pose_mdl_state_dict"]
    return import_torch_state(flax_params, flax_batch_stats, blob, model_name)


def export_torch_state(
    flax_params: Any, flax_batch_stats: Any, model_name: str
) -> Dict[str, np.ndarray]:
    """Inverse of import_torch_state: emit a reference-schema state dict
    (numpy values) from flax variables — lets checkpoints trained here be
    consumed by reference-style tooling."""
    if model_name not in MODEL_MAPPINGS:
        raise KeyError(f"No torch mapping for model '{model_name}'")
    params = jax.tree.map(np.asarray, jax.device_get(flax_params))
    batch_stats = jax.tree.map(np.asarray, jax.device_get(flax_batch_stats))
    if model_name == "DispResNet":
        # infer depth/block-type from the flax tree (no torch state here)
        mapping = _dispresnet_mapping(
            shape=_detect_resnet_shape_from_params(params)
        )
    elif model_name == "StnDispNet":
        use_stn = "Dense_0" in params
        if use_stn and int(params["Dense_0"]["kernel"].shape[0]) != 15360:
            # mirror of the import-side check: the reference STN head is a
            # FIXED-resolution Linear (32*12*40 = 15360 at 384x1280,
            # /root/reference/models/depth/stn_depth_net.py:69); exporting
            # a different flatten width would fail the reference's strict
            # load_state_dict — emit the identity branch instead
            print(
                "warning: STN branch not exported (resolution-fixed fc_loc "
                f"flatten mismatch: {int(params['Dense_0']['kernel'].shape[0])}"
                " != 15360); writing identity STN state"
            )
            use_stn = False
            mapping = _stndispnet_mapping(use_stn=True, torch_stn=False)
        else:
            mapping = _stndispnet_mapping(use_stn=use_stn)
    else:
        mapping = MODEL_MAPPINGS[model_name]()
    out: Dict[str, np.ndarray] = {}
    if model_name == "StnDispNet" and not use_stn:
        # reference state dicts always carry the (dead) STN branch;
        # synthesize its identity init so a strict torch load succeeds
        out.update(_stn_branch_identity_state())
    for flax_path, (torch_prefix, kind) in mapping.items():
        if kind == "conv":
            leaf = _get_path(params, flax_path)
            target = leaf["Conv_0"] if "Conv_0" in leaf else leaf
            out[f"{torch_prefix}.weight"] = _f2t_conv(np.asarray(target["kernel"]))
            if "bias" in target:
                out[f"{torch_prefix}.bias"] = np.asarray(target["bias"])
        elif kind == "convT":
            leaf = _get_path(params, flax_path)
            out[f"{torch_prefix}.weight"] = _f2t_convT(np.asarray(leaf["kernel"]))
            if "bias" in leaf:
                out[f"{torch_prefix}.bias"] = np.asarray(leaf["bias"])
        elif kind.startswith("linear"):
            leaf = _get_path(params, flax_path)
            weight = np.asarray(leaf["kernel"])
            if kind.startswith("linear_chw"):
                channels = int(kind.split(":", 1)[1])
                hw = weight.shape[0] // channels
                perm = chw_to_hwc_permutation(channels, 1, hw)
                inv = np.argsort(perm)
                weight = weight[inv]
            out[f"{torch_prefix}.weight"] = _f2t_linear(weight)
            out[f"{torch_prefix}.bias"] = np.asarray(leaf["bias"])
        elif kind == "gn":
            leaf = _get_path(params, flax_path)
            out[f"{torch_prefix}.weight"] = np.asarray(leaf["scale"])
            out[f"{torch_prefix}.bias"] = np.asarray(leaf["bias"])
        elif kind == "bn":
            leaf = _get_path(params, flax_path)
            stats = _get_path(batch_stats, flax_path)
            out[f"{torch_prefix}.weight"] = np.asarray(leaf["scale"])
            out[f"{torch_prefix}.bias"] = np.asarray(leaf["bias"])
            out[f"{torch_prefix}.running_mean"] = np.asarray(stats["mean"])
            out[f"{torch_prefix}.running_var"] = np.asarray(stats["var"])
            # torch BatchNorm2d registers this buffer whenever
            # track_running_stats=True; a strict load_state_dict on the
            # torch side fails without it
            out[f"{torch_prefix}.num_batches_tracked"] = np.array(0, np.int64)
    return out


def count_reference_params(torch_state: Dict[str, Any]) -> int:
    """Number of LEARNABLE tensors in a reference-schema state dict — what
    torch `model.parameters()` yields: .weight/.bias entries, excluding BN
    buffers (running stats, num_batches_tracked)."""
    return sum(1 for k in torch_state if k.endswith((".weight", ".bias")))


def fresh_adam_state_dict(n_params: int, lr: float) -> Dict[str, Any]:
    """A torch.optim.Adam state dict for a FRESH optimizer over `n_params`
    tensors in one param group — the reference's optimizer layout (a single
    Adam over depth.parameters() + pose.parameters(),
    /root/reference/trainer.py:70-75). Its load_chkpnt
    (/root/reference/trainer.py:144-152) can load this and resume with
    reset moments. Optax Adam moments are NOT translated because torch
    keys them by parameters() traversal order, which this framework does
    not replicate; a reset-moment resume is the honest equivalent."""
    return {
        "state": {},
        "param_groups": [
            {
                "lr": float(lr),
                "betas": (0.9, 0.999),
                "eps": 1e-8,
                "weight_decay": 0,
                "amsgrad": False,
                "params": list(range(n_params)),
            }
        ],
    }


def _to_torch_tensors(state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    import torch

    return {
        k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in state.items()
    }


def export_reference_checkpoint(
    params: Any,
    batch_stats: Any,
    depth_name: str,
    pose_name: str,
    path: str,
    *,
    epoch: int = 0,
    loss: Any = None,
    valid_acc: float = 0.0,
    lr: float = 1e-4,
) -> Dict[str, Any]:
    """Write a reference-loadable `.pth` training checkpoint — the exact
    dict schema {epoch, dpth_mdl_state_dict, pose_mdl_state_dict,
    optimizer_state_dict, loss, valid_acc} the reference saves and resumes
    from (/root/reference/trainer.py:129-152) — from flax train-state
    variables. `params`/`batch_stats` are the train-state trees holding
    "depth" and "pose" subtrees. Returns the checkpoint dict (torch
    tensors), after torch.save-ing it to `path`."""
    import torch

    depth_sd = export_torch_state(
        params["depth"], batch_stats.get("depth", {}), depth_name
    )
    pose_sd = export_torch_state(
        params["pose"], batch_stats.get("pose", {}), pose_name
    )
    n_params = count_reference_params(depth_sd) + count_reference_params(pose_sd)
    checkpoint = {
        "epoch": int(epoch),
        "dpth_mdl_state_dict": _to_torch_tensors(depth_sd),
        "pose_mdl_state_dict": _to_torch_tensors(pose_sd),
        "optimizer_state_dict": fresh_adam_state_dict(n_params, lr),
        "loss": loss,
        "valid_acc": float(valid_acc),
    }
    torch.save(checkpoint, path)
    return checkpoint


def export_bts_serving_checkpoint(
    params: Any, batch_stats: Any, path: str
) -> Dict[str, Any]:
    """Write a `{"model": <DataParallel-prefixed BTS state dict>}` blob —
    the format the reference's ROS serving node unpickles
    (/root/reference/pseudo-lidar/DepthPipeline.py:121-127: it wraps the
    net in nn.DataParallel purely so checkpoint keys carry the `module.`
    prefix, then loads checkpoint['model'])."""
    import torch

    state = export_torch_state(params, batch_stats, "BtsModel")
    checkpoint = {
        "model": {f"module.{k}": v for k, v in _to_torch_tensors(state).items()}
    }
    torch.save(checkpoint, path)
    return checkpoint


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference .pth checkpoint file
    ({epoch, dpth_mdl_state_dict, pose_mdl_state_dict, ...},
    /root/reference/trainer.py:132-137)."""
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def load_serving_weights(config, state, torch_checkpoint=None,
                         checkpoint=None):
    """Resolve the depth-model weights a serving entry point should use.

    One shared path for cli/inference, cli/export (and anything else
    that turns a config + optional checkpoint flags into variables):

      * torch_checkpoint: a reference-schema .pth (full checkpoint, bare
        state dict, or torchvision ImageNet weights for DispResNet);
      * checkpoint: an orbax checkpoint dir — MUST contain a restorable
        state (a typo'd path must not silently serve untrained weights);
      * neither: the config's checkpoint dir when from_scratch is False,
        else the state's init weights.

    Returns (params, batch_stats, source) where source describes the
    weight provenance ("init (untrained)" when nothing was restored).

    A full reference checkpoint ({epoch, dpth_mdl_state_dict,
    pose_mdl_state_dict, ...}, /root/reference/trainer.py:132-137) also
    restores the POSE subtree — entry points that re-export a training
    checkpoint (cli/export --format torch) must not silently replace
    trained pose weights with random init.
    """
    import os

    params, batch_stats = state.params, state.batch_stats

    if torch_checkpoint:
        if torch_checkpoint.endswith(".npz"):
            blob: Dict[str, Any] = dict(np.load(torch_checkpoint))
        else:
            blob = load_torch_checkpoint(torch_checkpoint)
        if config.model.depth.name == "DispResNet":
            depth_params, depth_stats = import_pretrained_depth(
                params["depth"], batch_stats["depth"], blob
            )
        else:
            state_dict = blob.get("dpth_mdl_state_dict", blob)
            depth_params, depth_stats = import_torch_state(
                params["depth"], batch_stats["depth"],
                state_dict, config.model.depth.name,
            )
        new_params = dict(params, depth=depth_params)
        new_stats = dict(batch_stats, depth=depth_stats)
        if "pose" in params and isinstance(blob, dict) \
                and "pose_mdl_state_dict" in blob:
            try:
                pose_params, pose_stats = import_torch_state(
                    params["pose"], batch_stats.get("pose", {}),
                    blob["pose_mdl_state_dict"], config.model.pose.name,
                )
            except KeyError as err:
                print(
                    f"warning: pose weights in {torch_checkpoint} do not "
                    f"match model.pose.name={config.model.pose.name} "
                    f"({err}); pose stays at random init"
                )
            else:
                new_params["pose"] = pose_params
                new_stats["pose"] = pose_stats
        return new_params, new_stats, torch_checkpoint

    if checkpoint or not config.action.from_scratch:
        path = checkpoint or os.path.join(
            config.action.checkpoint_dir, config.model.name
        )
        restored = CheckpointManager(path).restore(state)
        if restored is not None:
            new_state = restored[0]
            return new_state.params, new_state.batch_stats, path
        if checkpoint:
            # an EXPLICIT checkpoint that restores nothing is an error:
            # falling back to init weights would ship an untrained model
            # labeled with this path as provenance
            raise FileNotFoundError(
                f"--checkpoint {checkpoint}: no restorable state found"
            )
        print(f"warning: no checkpoint under {path}; using init weights")

    return params, batch_stats, "init (untrained)"
