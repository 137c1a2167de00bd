"""Pretrained-encoder initialization tests (VERDICT r1 task 1).

The reference's model of record trains from an ImageNet-pretrained
torchvision resnet18 (`ResnetEncoder(18, True)`,
/root/reference/models/depth/resnet_dispnet.py:30). These tests build a
torchvision-SCHEMA resnet18 in torch (same module tree and state-dict
keys; torchvision itself is not installed here), import its state dict
through the pretrained-init path, and assert per-layer activation parity
of all five encoder feature maps against the torch forward on a fixed
input — plus the config-driven wiring into create_train_state.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402

from unsupervised_pseuso_lidar_tpu.models.depth.resnet_dispnet import (  # noqa: E402
    DispResNet,
    ResnetEncoder,
)
from unsupervised_pseuso_lidar_tpu.train.checkpoint import (  # noqa: E402
    import_pretrained_depth,
    normalize_depth_pretrained_state,
)


class TorchBasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.relu = nn.ReLU()
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout),
            )

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchResNet18(nn.Module):
    """torchvision.models.resnet18 module tree (state-dict-key compatible)."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU()
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = nn.Sequential(TorchBasicBlock(64, 64), TorchBasicBlock(64, 64))
        self.layer2 = nn.Sequential(TorchBasicBlock(64, 128, 2), TorchBasicBlock(128, 128))
        self.layer3 = nn.Sequential(TorchBasicBlock(128, 256, 2), TorchBasicBlock(256, 256))
        self.layer4 = nn.Sequential(TorchBasicBlock(256, 512, 2), TorchBasicBlock(512, 512))
        self.fc = nn.Linear(512, 1000)

    def features(self, x):
        feats = []
        x = self.relu(self.bn1(self.conv1(x)))
        feats.append(x)
        x = self.maxpool(x)
        for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
            x = layer(x)
            feats.append(x)
        return feats


def _randomized_torch_resnet(seed=0):
    torch.manual_seed(seed)
    model = TorchResNet18()
    with torch.no_grad():
        for name, p in model.named_parameters():
            p.copy_(torch.randn_like(p) * 0.05)
        for name, b in model.named_buffers():
            if name.endswith("running_mean"):
                b.copy_(torch.randn_like(b) * 0.1)
            elif name.endswith("running_var"):
                b.copy_(torch.rand_like(b) * 0.5 + 0.5)
    model.eval()
    return model


def _init_dispresnet(shape=(1, 64, 96, 3)):
    model = DispResNet()
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros(shape), train=False
    )
    return model, variables["params"], variables["batch_stats"]


class TestEncoderActivationParity:
    def test_five_feature_maps_match_torch(self):
        tmodel = _randomized_torch_resnet()
        state_dict = {k: v.numpy() for k, v in tmodel.state_dict().items()}

        _, params, stats = _init_dispresnet()
        params, stats = import_pretrained_depth(params, stats, state_dict)

        rng = np.random.default_rng(1)
        x = rng.uniform(-1, 1, (2, 64, 96, 3)).astype(np.float32)
        with torch.no_grad():
            torch_feats = tmodel.features(
                torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
            )

        encoder = ResnetEncoder()
        jax_feats = encoder.apply(
            {
                "params": params["ResnetEncoder_0"],
                "batch_stats": stats["ResnetEncoder_0"],
            },
            jnp.asarray(x),
            train=False,
        )
        assert len(jax_feats) == len(torch_feats) == 5
        for i, (jf, tf) in enumerate(zip(jax_feats, torch_feats)):
            tf = np.transpose(tf.numpy(), (0, 2, 3, 1))
            np.testing.assert_allclose(
                np.asarray(jf), tf, atol=2e-4, rtol=2e-4,
                err_msg=f"feature map {i}",
            )

    def test_decoder_untouched_by_encoder_only_init(self):
        tmodel = _randomized_torch_resnet()
        state_dict = {k: v.numpy() for k, v in tmodel.state_dict().items()}
        _, params, stats = _init_dispresnet()
        before = jax.tree.map(np.asarray, params["DepthDecoder_0"])
        params2, _ = import_pretrained_depth(params, stats, state_dict)
        after = params2["DepthDecoder_0"]
        jax.tree.map(np.testing.assert_array_equal, before, after)
        # ...but the encoder DID change
        conv1 = params2["ResnetEncoder_0"]["TorchConv_0"]["Conv_0"]["kernel"]
        expected = np.transpose(state_dict["conv1.weight"], (2, 3, 1, 0))
        np.testing.assert_allclose(np.asarray(conv1), expected, atol=1e-6)

    def test_normalize_accepts_all_three_schemas(self):
        tmodel = _randomized_torch_resnet()
        tv = {k: v.numpy() for k, v in tmodel.state_dict().items()}
        s1, enc_only1 = normalize_depth_pretrained_state(tv)
        assert enc_only1 and "encoder.encoder.conv1.weight" in s1
        assert not any(k.endswith("fc.weight") for k in s1)

        dispresnet_style = {f"encoder.encoder.{k}": v for k, v in tv.items()}
        s2, enc_only2 = normalize_depth_pretrained_state(dispresnet_style)
        assert not enc_only2

        full_ckpt = {"epoch": 3, "dpth_mdl_state_dict": dispresnet_style}
        s3, enc_only3 = normalize_depth_pretrained_state(full_ckpt)
        assert not enc_only3 and "encoder.encoder.conv1.weight" in s3

        with pytest.raises(KeyError):
            normalize_depth_pretrained_state({"bogus.weight": tv["conv1.weight"]})


class TestConfigWiring:
    def test_create_train_state_loads_pretrained_npz(self, tmp_path):
        from unsupervised_pseuso_lidar_tpu.train.config import Config
        from unsupervised_pseuso_lidar_tpu.train.trainer import (
            create_train_state,
        )

        tmodel = _randomized_torch_resnet()
        state_dict = {k: v.numpy() for k, v in tmodel.state_dict().items()}
        npz_path = tmp_path / "resnet18_imagenet.npz"
        np.savez(npz_path, **state_dict)

        config = Config.from_dict(
            {
                "model": {
                    "name": "t",
                    "depth": {
                        "name": "DispResNet",
                        "pretrained_path": str(npz_path),
                    },
                    "pose": {"name": "PoseNet"},
                },
                "datasets": {
                    "augmentation": {"image_width": 96, "image_height": 64},
                    "sequence_length": 3,
                },
                "action": {"batch_size": 1},
            }
        )
        state, _, _, _ = create_train_state(
            config, jax.random.PRNGKey(0), steps_per_epoch=10
        )
        conv1 = state.params["depth"]["ResnetEncoder_0"]["TorchConv_0"][
            "Conv_0"
        ]["kernel"]
        expected = np.transpose(state_dict["conv1.weight"], (2, 3, 1, 0))
        np.testing.assert_allclose(np.asarray(conv1), expected, atol=1e-6)
        # BN running stats imported too
        bn_mean = state.batch_stats["depth"]["ResnetEncoder_0"][
            "BatchNorm_0"
        ]["mean"]
        np.testing.assert_allclose(
            np.asarray(bn_mean), state_dict["bn1.running_mean"], atol=1e-6
        )

    def test_config_accepts_pretrained_path_key(self):
        from unsupervised_pseuso_lidar_tpu.train.config import Config

        config = Config.from_dict(
            {"model": {"depth": {"name": "DispResNet",
                                 "pretrained_path": "/x/y.pth"}}}
        )
        assert config.model.depth.pretrained_path == "/x/y.pth"
        assert "pretrained_path" not in config.model.depth.kwargs

    def test_pose_pretrained_path_wired(self, tmp_path):
        # model.pose.pretrained_path must actually initialize the pose
        # net (it used to be parsed and silently ignored). Round-trips a
        # reference-schema PoseNet state dict through create_train_state.
        from unsupervised_pseuso_lidar_tpu.train.checkpoint import (
            export_torch_state,
        )
        from unsupervised_pseuso_lidar_tpu.train.config import Config
        from unsupervised_pseuso_lidar_tpu.train.trainer import (
            create_train_state,
        )

        base = {
            "model": {
                "name": "t",
                "depth": {"name": "DispResNet"},
                "pose": {"name": "PoseNet"},
            },
            "datasets": {
                "augmentation": {"image_width": 96, "image_height": 64},
                "sequence_length": 3,
            },
            "action": {"batch_size": 1},
        }
        state0, _, _, _ = create_train_state(
            Config.from_dict(base), jax.random.PRNGKey(1), steps_per_epoch=10
        )
        tstate = export_torch_state(
            state0.params["pose"], state0.batch_stats["pose"], "PoseNet"
        )
        # shift every tensor so the import is distinguishable from both
        # the exporting state and a fresh random init
        tstate = {k: np.asarray(v) + 1.0 for k, v in tstate.items()}
        npz_path = tmp_path / "posenet_pretrained.npz"
        np.savez(npz_path, **tstate)

        cfg = dict(base)
        cfg["model"] = {
            **base["model"],
            "pose": {"name": "PoseNet", "pretrained_path": str(npz_path)},
        }
        state, _, _, _ = create_train_state(
            Config.from_dict(cfg), jax.random.PRNGKey(0), steps_per_epoch=10
        )
        out = export_torch_state(
            state.params["pose"], state.batch_stats["pose"], "PoseNet"
        )
        assert set(out) == set(tstate)
        for k, v in tstate.items():
            np.testing.assert_allclose(out[k], v, atol=1e-5, err_msg=k)


class TorchBottleneck(nn.Module):
    """torchvision Bottleneck (v1.5: stride on the 3x3), state-dict-key
    compatible."""

    def __init__(self, cin, width, stride=1):
        super().__init__()
        cout = width * 4
        self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        self.relu = nn.ReLU()
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout),
            )

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchResNet50(nn.Module):
    """torchvision.models.resnet50 module tree (state-dict-key
    compatible); parity oracle for the bottleneck encoder depths the
    reference accepts (/root/reference/models/depth/resnet_dispnet.py:
    20-32, resnets[50])."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU()
        self.maxpool = nn.MaxPool2d(3, 2, 1)

        def layer(cin, width, blocks, stride):
            mods = [TorchBottleneck(cin, width, stride)]
            mods += [TorchBottleneck(width * 4, width) for _ in range(blocks - 1)]
            return nn.Sequential(*mods)

        self.layer1 = layer(64, 64, 3, 1)
        self.layer2 = layer(256, 128, 4, 2)
        self.layer3 = layer(512, 256, 6, 2)
        self.layer4 = layer(1024, 512, 3, 2)
        self.fc = nn.Linear(2048, 1000)

    def features(self, x):
        feats = []
        x = self.relu(self.bn1(self.conv1(x)))
        feats.append(x)
        x = self.maxpool(x)
        for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
            x = layer(x)
            feats.append(x)
        return feats


@pytest.mark.slow
class TestBottleneckEncoderParity:
    def test_resnet50_feature_maps_match_torch(self):
        torch.manual_seed(1)
        tmodel = TorchResNet50()
        with torch.no_grad():
            for _, p in tmodel.named_parameters():
                p.copy_(torch.randn_like(p) * 0.05)
            for name, b in tmodel.named_buffers():
                if name.endswith("running_mean"):
                    b.copy_(torch.randn_like(b) * 0.1)
                elif name.endswith("running_var"):
                    b.copy_(torch.rand_like(b) * 0.5 + 0.5)
        tmodel.eval()
        state_dict = {k: v.numpy() for k, v in tmodel.state_dict().items()}

        model = DispResNet(num_layers=50)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)), train=False
        )
        params, stats = import_pretrained_depth(
            variables["params"], variables["batch_stats"], state_dict
        )

        rng = np.random.default_rng(2)
        x = rng.uniform(-1, 1, (2, 64, 96, 3)).astype(np.float32)
        with torch.no_grad():
            torch_feats = tmodel.features(
                torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
            )
        encoder = ResnetEncoder(num_layers=50)
        jax_feats = encoder.apply(
            {
                "params": params["ResnetEncoder_0"],
                "batch_stats": stats["ResnetEncoder_0"],
            },
            jnp.asarray(x),
            train=False,
        )
        assert jax_feats[-1].shape[-1] == 2048
        for i, (jf, tf) in enumerate(zip(jax_feats, torch_feats)):
            tf = np.transpose(tf.numpy(), (0, 2, 3, 1))
            np.testing.assert_allclose(
                np.asarray(jf), tf, atol=5e-4, rtol=5e-4,
                err_msg=f"feature map {i}",
            )

    def test_resnet50_encoder_param_count(self):
        # torchvision resnet50 minus the fc head: 25,557,032 - 2,049,000
        encoder = ResnetEncoder(num_layers=50)
        variables = encoder.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)), train=False
        )
        n = sum(
            int(np.prod(p.shape))
            for p in jax.tree.leaves(variables["params"])
        )
        assert n == 25_557_032 - 2_049_000 == 23_508_032, n
