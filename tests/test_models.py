"""Model zoo tests: output shapes/ranges, parameter counts vs the reference
architectures, and torch-oracle equivalence of the torch-compatible layers.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unsupervised_pseuso_lidar_tpu.models import build_model
from unsupervised_pseuso_lidar_tpu.models.layers import TorchConv, TorchConvTranspose

RNG = np.random.default_rng(1)


def _init_and_run(model, *args, train=False, method=None):
    # jit init+apply: the compiled programs land in the persistent cache
    # (tests/.jax_cache), so warm suite runs skip both the compile AND
    # the op-by-op eager dispatch a plain .init/.apply would pay
    if _accepts_train(model):
        variables = jax.jit(partial(model.init, train=train))(
            jax.random.PRNGKey(0), *args
        )
        out = jax.jit(partial(model.apply, train=train))(variables, *args)
    else:
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), *args)
        out = jax.jit(model.apply)(variables, *args)
    return out, variables


def _accepts_train(model):
    import inspect

    return "train" in inspect.signature(model.__call__).parameters


class TestTorchLayers:
    def test_reflect_pad1_matches_jnp_pad(self):
        # the slice+concat formulation (HBM-cheap on TPU) must be exact,
        # including gradients, vs jnp.pad(mode='reflect')
        from unsupervised_pseuso_lidar_tpu.ops.resample import reflect_pad1

        ref_pad = lambda t: jnp.pad(
            t, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect"
        )
        # incl. size-1 dims (the decoder's deepest level at small test
        # resolutions), where reflect degenerates to replication
        for shape in [(2, 5, 7, 3), (1, 1, 4, 2), (1, 4, 1, 2), (1, 1, 1, 2)]:
            t = jnp.asarray(RNG.uniform(-1, 1, shape).astype(np.float32))
            np.testing.assert_array_equal(
                np.asarray(reflect_pad1(t)), np.asarray(ref_pad(t))
            )
        x = jnp.asarray(RNG.uniform(-1, 1, (2, 5, 7, 3)).astype(np.float32))
        grad_of = lambda f: jax.grad(lambda t: jnp.sum(jnp.sin(f(t))))(x)
        np.testing.assert_array_equal(
            np.asarray(grad_of(reflect_pad1)), np.asarray(grad_of(ref_pad))
        )

    def test_conv3x3_border_ring_matches_naive_reflect(self):
        # Conv3x3 computes interior via fused zero-pad conv + exact border
        # strips (models/layers.py); must equal the naive reflect-pad conv
        # bit-for-bit in fwd, and to fp32 reassociation noise in grad
        from flax import linen as nn

        from unsupervised_pseuso_lidar_tpu.models.layers import Conv3x3
        from unsupervised_pseuso_lidar_tpu.ops.resample import reflect_pad1

        class Oracle(nn.Module):
            features: int = 8

            @nn.compact
            def __call__(self, x):
                return nn.Conv(
                    self.features, (3, 3), padding="VALID",
                    kernel_init=nn.initializers.he_normal(),
                )(reflect_pad1(x))

        for shape in [(2, 6, 9, 4), (1, 3, 3, 2), (1, 2, 5, 3)]:
            x = jnp.asarray(RNG.uniform(-1, 1, shape).astype(np.float32))
            model = Conv3x3(8)
            variables = model.init(jax.random.PRNGKey(1), x)
            ours = jax.jit(model.apply)(variables, x)
            # same single-Conv tree
            ref = jax.jit(Oracle(8).apply)(variables, x)
            np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))
            g1 = jax.jit(jax.grad(
                lambda t: jnp.sum(jnp.sin(model.apply(variables, t)))
            ))(x)
            g2 = jax.jit(jax.grad(
                lambda t: jnp.sum(jnp.sin(Oracle(8).apply(variables, t)))
            ))(x)
            np.testing.assert_allclose(
                np.asarray(g1), np.asarray(g2), atol=1e-5
            )

    @pytest.mark.slow  # ~22s warm on the 1-core host (compile-bound)
    def test_conv3x3_pre_upsample2x_matches_unfused(self):
        # pre_upsample2x folds conv3x3(upsample2x_nearest(x)) into one
        # half-res 4-phase conv + depth-to-space (models/layers.py
        # _up2_phase_kernel); identical params under Conv_0 and identical
        # math up to float reassociation, fwd and bwd
        from unsupervised_pseuso_lidar_tpu.models.layers import Conv3x3
        from unsupervised_pseuso_lidar_tpu.ops.resample import upsample2x_nearest

        for shape in [(2, 6, 10, 4), (1, 3, 5, 2), (1, 1, 4, 3)]:
            x = jnp.asarray(RNG.uniform(-1, 1, shape).astype(np.float32))
            ref_mod = Conv3x3(7)
            fus_mod = Conv3x3(7, pre_upsample2x=True)
            variables = ref_mod.init(
                jax.random.PRNGKey(2), upsample2x_nearest(x)
            )
            assert (
                fus_mod.init(jax.random.PRNGKey(2), x)["params"][
                    "Conv_0"
                ]["kernel"].shape
                == variables["params"]["Conv_0"]["kernel"].shape
            )
            ref = ref_mod.apply(variables, upsample2x_nearest(x))
            got = fus_mod.apply(variables, x)
            assert got.shape == ref.shape
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), atol=2e-5
            )
            g1 = jax.grad(
                lambda t: jnp.sum(
                    jnp.sin(ref_mod.apply(variables, upsample2x_nearest(t)))
                )
            )(x)
            g2 = jax.grad(
                lambda t: jnp.sum(jnp.sin(fus_mod.apply(variables, t)))
            )(x)
            np.testing.assert_allclose(
                np.asarray(g1), np.asarray(g2), atol=2e-5
            )

    def test_conv_matches_torch(self):
        torch = pytest.importorskip("torch")
        x = RNG.uniform(-1, 1, (2, 12, 16, 5)).astype(np.float32)
        for k, s in [(3, 1), (3, 2), (5, 2), (7, 2), (1, 1)]:
            layer = TorchConv(8, k, stride=s)
            variables = layer.init(jax.random.PRNGKey(0), jnp.asarray(x))
            ours = layer.apply(variables, jnp.asarray(x))

            kern = np.asarray(variables["params"]["Conv_0"]["kernel"])  # HWIO
            bias = np.asarray(variables["params"]["Conv_0"]["bias"])
            tconv = torch.nn.Conv2d(5, 8, k, stride=s, padding=(k - 1) // 2)
            with torch.no_grad():
                tconv.weight.copy_(
                    torch.from_numpy(kern).permute(3, 2, 0, 1)
                )  # OIHW
                tconv.bias.copy_(torch.from_numpy(bias))
                theirs = tconv(torch.from_numpy(x).permute(0, 3, 1, 2))
            np.testing.assert_allclose(
                np.asarray(ours),
                theirs.permute(0, 2, 3, 1).numpy(),
                atol=1e-4,
            )

    def test_conv_space_to_depth_matches_plain(self):
        # space_to_depth folds the 7x7/s2 stem into a 4x4/s1 conv over
        # 2x2-blocked input (models/layers.TorchConv._s2d_conv): same
        # parameter under Conv_0, same MACs, fwd and bwd, plus the
        # odd-size fallback to the plain conv
        for shape, bias in [((2, 16, 20, 3), False), ((1, 8, 12, 5), True)]:
            x = jnp.asarray(RNG.uniform(-1, 1, shape).astype(np.float32))
            plain = TorchConv(8, 7, stride=2, use_bias=bias)
            s2d = TorchConv(8, 7, stride=2, use_bias=bias,
                            space_to_depth=True)
            variables = plain.init(jax.random.PRNGKey(1), x)
            assert jax.tree_util.tree_structure(
                s2d.init(jax.random.PRNGKey(1), x)
            ) == jax.tree_util.tree_structure(variables)
            ref = plain.apply(variables, x)
            got = s2d.apply(variables, x)
            assert got.shape == ref.shape
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), atol=2e-5
            )
            g1 = jax.grad(
                lambda v: jnp.sum(jnp.sin(plain.apply(v, x)))
            )(variables)
            g2 = jax.grad(
                lambda v: jnp.sum(jnp.sin(s2d.apply(v, x)))
            )(variables)
            np.testing.assert_allclose(
                np.asarray(g1["params"]["Conv_0"]["kernel"]),
                np.asarray(g2["params"]["Conv_0"]["kernel"]),
                atol=2e-5,
            )
        # odd H: falls back to the plain conv, same result
        x = jnp.asarray(RNG.uniform(-1, 1, (1, 15, 20, 3)).astype(np.float32))
        plain = TorchConv(8, 7, stride=2)
        s2d = TorchConv(8, 7, stride=2, space_to_depth=True)
        variables = plain.init(jax.random.PRNGKey(1), x)
        np.testing.assert_allclose(
            np.asarray(s2d.apply(variables, x)),
            np.asarray(plain.apply(variables, x)),
            atol=1e-6,
        )

    def test_s2d_tail_matches_plain(self):
        # DepthDecoder s2d_tail computes the full-res tail (pre-upsample
        # ConvBlock + ELU + disp head + sigmoid) in the space-to-depth
        # phase domain — exact same math and parameters as the plain
        # full-res path, including the reflect border ring, for even AND
        # odd (raw-KITTI-geometry) input shapes, fwd and bwd.
        from unsupervised_pseuso_lidar_tpu.models.depth.resnet_dispnet import (
            DispResNet,
        )

        # the odd (raw-KITTI-geometry) shape strictly subsumes the even
        # case: it exercises the reflect ring, the ceil-crop, AND the odd
        # interleave edge — one shape keeps the trace count (the warm-run
        # cost on this host) halved
        for shape in [(1, 47, 83, 3)]:
            x = jnp.asarray(RNG.uniform(-1, 1, shape).astype(np.float32))
            plain = DispResNet(s2d_tail=False)
            s2d = DispResNet(s2d_tail=True)
            init = jax.jit(partial(plain.init, train=False))
            variables = init(jax.random.PRNGKey(1), x)
            assert jax.tree_util.tree_structure(
                jax.jit(partial(s2d.init, train=False))(
                    jax.random.PRNGKey(1), x
                )
            ) == jax.tree_util.tree_structure(variables)
            ref = jax.jit(partial(plain.apply, train=False))(variables, x)[0]
            got = jax.jit(partial(s2d.apply, train=False))(variables, x)[0]
            assert got.shape == ref.shape
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), atol=2e-6
            )

        # gradient equivalence at a small odd shape (full-model CPU grads
        # are the expensive part of this test; the fwd loop above already
        # covered the larger shapes)
        xg = jnp.asarray(RNG.uniform(-1, 1, (1, 31, 43, 3)).astype(np.float32))
        variables = jax.jit(partial(plain.init, train=False))(
            jax.random.PRNGKey(1), xg
        )

        def scalar_loss(model):
            def f(params):
                out = model.apply(
                    {"params": params,
                     "batch_stats": variables["batch_stats"]},
                    xg, train=False,
                )[0]
                return jnp.sum(jnp.sin(7.0 * out))
            return f

        g1 = jax.jit(jax.grad(scalar_loss(plain)))(variables["params"])
        g2 = jax.jit(jax.grad(scalar_loss(s2d)))(variables["params"])
        # grads agree to float reassociation noise (verified 1e-12 in
        # f64): compare RELATIVE to each leaf's magnitude — decoder-tail
        # grad sums reach O(1e4) here
        rel = jax.tree.map(
            lambda a, b: float(
                jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-12)
            ),
            g1, g2,
        )
        assert max(jax.tree_util.tree_leaves(rel)) < 1e-5

    def test_conv_transpose_matches_torch(self):
        torch = pytest.importorskip("torch")
        x = RNG.uniform(-1, 1, (2, 6, 8, 4)).astype(np.float32)
        for k in (3, 4):
            pad = 1
            op = 1 if k == 3 else 0
            layer = TorchConvTranspose(
                7, kernel_size=k, stride=2, padding=pad, output_padding=op
            )
            variables = layer.init(jax.random.PRNGKey(0), jnp.asarray(x))
            ours = layer.apply(variables, jnp.asarray(x))

            kern = np.asarray(variables["params"]["kernel"])  # (k,k,in,out)
            bias = np.asarray(variables["params"]["bias"])
            tconv = torch.nn.ConvTranspose2d(
                4, 7, k, stride=2, padding=pad, output_padding=op
            )
            with torch.no_grad():
                # torch layout (in, out, kh, kw)
                tconv.weight.copy_(torch.from_numpy(kern).permute(2, 3, 0, 1))
                tconv.bias.copy_(torch.from_numpy(bias))
                theirs = tconv(torch.from_numpy(x).permute(0, 3, 1, 2))
            assert ours.shape == tuple(
                theirs.permute(0, 2, 3, 1).shape
            ), f"k={k}"
            np.testing.assert_allclose(
                np.asarray(ours),
                theirs.permute(0, 2, 3, 1).numpy(),
                atol=1e-4,
            )


class TestDepthModels:
    def test_dispresnet_shapes(self):
        model = build_model("DispResNet")
        x = jnp.zeros((1, 64, 96, 3))
        disps, variables = _init_and_run(model, x)
        assert len(disps) == 1
        assert disps[0].shape == (1, 64, 96, 1)
        vals = np.asarray(disps[0])
        assert (vals >= 0).all() and (vals <= 1).all()
        # batch_stats collection exists (BatchNorm present)
        assert "batch_stats" in variables

    @pytest.mark.slow  # ~19s warm on the 1-core host (compile-bound)
    def test_dispresnet_odd_size(self):
        """Non-multiple-of-32 inputs (the raw KITTI 1242x375 geometry):
        the decoder crops its 2x upsample to the encoder skip (torch
        monodepth2 hard-fails on the 48-vs-47 concat) and the param tree
        is unchanged, so checkpoints stay interchangeable."""
        model = build_model("DispResNet")
        x_odd = jnp.zeros((1, 47, 78, 3))
        disps, variables = _init_and_run(model, x_odd)
        assert len(disps) == 1
        # scale-0 disp may overshoot by the crop remainder; the loss
        # resizes depths to image dims (losses/reprojection.py)
        assert disps[0].shape[1] >= 47 and disps[0].shape[2] >= 78
        x_even = jnp.zeros((1, 64, 96, 3))
        variables_even = model.init(jax.random.PRNGKey(0), x_even, train=False)
        shapes = lambda v: jax.tree.map(lambda p: p.shape, v["params"])
        assert shapes(variables) == shapes(variables_even)

    def test_dispresnet_param_count_matches_reference(self):
        # torchvision resnet18 conv+bn params (no fc): 11,176,512
        # + monodepth2 DepthDecoder (scales 0-3): 3,152,724
        model = build_model("DispResNet")
        x = jnp.zeros((1, 64, 96, 3))
        # eval_shape: a parameter COUNT needs shapes only — no init
        # compute (the eager init cost 34 s/run on this 1-core host)
        variables = jax.eval_shape(
            partial(model.init, train=False), jax.random.PRNGKey(0), x
        )
        n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
        assert n == 11_176_512 + 3_152_724 == 14_329_236, n

    def test_dispnets_shapes(self):
        model = build_model("DispNetS")
        x = jnp.zeros((1, 128, 256, 3))
        disps, _ = _init_and_run(model, x)
        assert len(disps) == 4
        assert disps[0].shape == (1, 128, 256, 1)
        assert disps[1].shape == (1, 64, 128, 1)
        assert disps[3].shape == (1, 16, 32, 1)
        vals = np.asarray(disps[0])
        # alpha*sigmoid+beta range
        assert (vals >= 0.01).all() and (vals <= 10.01).all()

    def test_dispnets_non_pow2_size(self):
        # sizes not divisible by 2^7: crop_like path (the reference's
        # disp_net.py:44-46 behavior; 640x192 is the bench config)
        model = build_model("DispNetS")
        x = jnp.zeros((1, 40, 56, 3))
        disps, _ = _init_and_run(model, x)
        assert disps[0].shape == (1, 40, 56, 1)
        assert disps[1].shape == (1, 20, 28, 1)

    def test_stn_dispnet_shapes(self):
        model = build_model("StnDispNet")
        x = jnp.zeros((1, 64, 96, 3))
        disps, _ = _init_and_run(model, x)
        assert disps[0].shape == (1, 64, 96, 1)


class TestPoseModels:
    def test_posenet_shape_and_scale(self):
        model = build_model("PoseNet")
        tgt = jnp.asarray(RNG.uniform(-1, 1, (2, 128, 256, 3)), dtype=jnp.float32)
        refs = [tgt, tgt]
        pose, _ = _init_and_run(model, tgt, refs)
        assert pose.shape == (2, 2, 6)

    def test_pose_fc_zeroes_rotation(self):
        model = build_model("PoseFc")
        tgt = jnp.asarray(RNG.uniform(-1, 1, (2, 128, 256, 3)), dtype=jnp.float32)
        pose, _ = _init_and_run(model, tgt, [tgt, tgt])
        assert pose.shape == (2, 2, 6)
        np.testing.assert_allclose(np.asarray(pose[..., :3]), 0.0)

    def test_pose_decoder(self):
        model = build_model("PoseDecoder", num_input_features=2)
        feats = [
            [jnp.zeros((1, 4, 6, 512))],
            [jnp.zeros((1, 4, 6, 512))],
        ]
        (aa, tr), _ = _init_and_run(model, feats)
        assert aa.shape == (1, 1, 1, 3)
        assert tr.shape == (1, 1, 1, 3)


def test_registry_unknown_model_raises():
    with pytest.raises(KeyError):
        build_model("NotAModel")


@pytest.mark.slow
class TestBts:
    def test_bts_shapes_and_param_count(self):
        model = build_model("BtsModel")
        x = jnp.zeros((1, 64, 96, 3))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        d8, d4, d2, r1, final = model.apply(variables, x, train=False)
        assert final.shape == (1, 64, 96, 1)
        assert d8.shape == d4.shape == d2.shape == (1, 64, 96, 1)
        assert r1.shape == (1, 64, 96, 1)
        vals = np.asarray(final)
        assert (vals >= 0).all() and (vals <= 80.0).all()
        # DenseNet-161 encoder channel widths are fixed by construction;
        # spot-check total param count is in the BTS ballpark (~47M+)
        n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
        assert n > 40_000_000, n

    def test_lpg_constant_plane(self):
        # A fronto-parallel plane (normal = +z, dist = d) must expand to
        # constant depth d at every subpixel.
        from unsupervised_pseuso_lidar_tpu.models.depth.bts import (
            local_planar_guidance,
        )

        eq = jnp.zeros((1, 2, 3, 4)).at[..., 2].set(1.0).at[..., 3].set(7.0)
        depth = local_planar_guidance(eq, 4)
        assert depth.shape == (1, 8, 12)
        np.testing.assert_allclose(np.asarray(depth), 7.0, rtol=1e-6)
