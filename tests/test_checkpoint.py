"""Checkpoint tests: torch<->flax state-dict round trips (the sfm.pth
compatibility path, SURVEY.md §7) and orbax persistence."""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unsupervised_pseuso_lidar_tpu.models import build_model
from unsupervised_pseuso_lidar_tpu.train.checkpoint import (
    CheckpointManager,
    chw_to_hwc_permutation,
    export_torch_state,
    import_torch_state,
)


def _init(model_name, shape=(1, 64, 96, 3), pose=False):
    model = build_model(model_name)
    x = jnp.zeros(shape)
    # jit the init: the compiled program persists in tests/.jax_cache, so
    # warm suite runs skip the compile and the eager per-op dispatch
    if pose:
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, [x, x])
    else:
        variables = jax.jit(partial(model.init, train=False))(
            jax.random.PRNGKey(0), x
        )
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    return model, params, stats


def _randomize(tree, seed=0):
    rng = np.random.default_rng(seed)
    leaves, treedef = jax.tree.flatten(tree)
    new = [rng.normal(size=np.shape(l)).astype(np.float32) for l in leaves]
    return jax.tree.unflatten(treedef, new)


@pytest.mark.parametrize(
    "model_name,pose,shape",
    [
        # the two big-CNN roundtrips are compile-heavy on the 1-core CI
        # host (~29s/24s warm) -> slow tier; the structural mapping they
        # share is covered fast by the Stn/Pose rows
        pytest.param(
            "DispResNet", False, (1, 64, 96, 3), marks=pytest.mark.slow
        ),
        pytest.param(
            "DispNetS", False, (1, 128, 128, 3), marks=pytest.mark.slow
        ),
        ("StnDispNet", False, (1, 64, 96, 3)),
        ("PoseNet", True, (1, 64, 96, 3)),
        ("PoseFc", True, (1, 128, 128, 3)),
    ],
)
def test_torch_roundtrip(model_name, pose, shape):
    """export -> import reproduces every tensor, and the exported dict has
    the reference's key schema."""
    _, params, stats = _init(model_name, shape, pose)
    params = _randomize(params, seed=1)
    if stats:
        stats = _randomize(stats, seed=2)

    torch_state = export_torch_state(params, stats, model_name)
    assert torch_state, model_name
    # all weights 4D conv OIHW or 2D linear; keys look like torch keys
    for key, val in torch_state.items():
        assert isinstance(val, np.ndarray)
        assert "/" not in key and key.count(".") >= 1

    params2, stats2 = import_torch_state(params, stats, torch_state, model_name)
    flat1 = dict(
        zip(
            [str(p) for p in jax.tree_util.tree_leaves_with_path(params)],
            jax.tree.leaves(params),
        )
    )
    for (p1, l1), (p2, l2) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(params2),
    ):
        assert str(p1) == str(p2)
        np.testing.assert_allclose(l1, l2, atol=1e-6, err_msg=f"{model_name}:{p1}")
    for (p1, l1), (p2, l2) in zip(
        jax.tree_util.tree_leaves_with_path(stats),
        jax.tree_util.tree_leaves_with_path(stats2),
    ):
        np.testing.assert_allclose(l1, l2, atol=1e-6, err_msg=f"{model_name}:{p1}")


def test_dispresnet_schema_matches_reference_keys():
    """Spot-check the exported key names against the reference module tree
    (resnet_dispnet.py module attribute paths)."""
    _, params, stats = _init("DispResNet")
    torch_state = export_torch_state(params, stats, "DispResNet")
    for key in (
        "encoder.encoder.conv1.weight",
        "encoder.encoder.bn1.running_mean",
        "encoder.encoder.layer1.0.conv1.weight",
        "encoder.encoder.layer2.0.downsample.0.weight",
        "encoder.encoder.layer4.1.bn2.running_var",
        "decoder.decoder.0.conv.conv.weight",
        "decoder.decoder.9.conv.conv.bias",
        "decoder.decoder.10.conv.weight",
        "decoder.decoder.13.conv.bias",
    ):
        assert key in torch_state, key
    # conv1 is OIHW 64x3x7x7
    assert torch_state["encoder.encoder.conv1.weight"].shape == (64, 3, 7, 7)


def test_import_accepts_dataparallel_prefix():
    _, params, stats = _init("PoseNet", pose=True)
    torch_state = export_torch_state(params, stats, "PoseNet")
    prefixed = {f"module.{k}": v for k, v in torch_state.items()}
    params2, _ = import_torch_state(params, stats, prefixed, "PoseNet")
    for l1, l2 in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_allclose(l1, l2, atol=1e-6)


def test_chw_permutation_inverse():
    perm = chw_to_hwc_permutation(12, 1, 30)
    inv = np.argsort(perm)
    x = np.arange(360)
    np.testing.assert_array_equal(x[perm][inv], x)


def test_posefc_import_preserves_function():
    """Importing an exported PoseFc must reproduce identical outputs —
    catches flatten-order (CHW vs HWC) mistakes in the FC mapping."""
    model, params, stats = _init("PoseFc", (1, 128, 128, 3), pose=True)
    params = _randomize(params, seed=3)
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (1, 128, 128, 3)),
                    dtype=jnp.float32)
    out1 = model.apply({"params": params}, x, [x, x])
    torch_state = export_torch_state(params, stats, "PoseFc")
    params2, _ = import_torch_state(params, stats, torch_state, "PoseFc")
    out2 = model.apply({"params": params2}, x, [x, x])
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_stn_dispnet_roundtrip_with_stn_branch():
    """StnDispNet with the STN branch enabled: export emits the reference's
    localization.* / fc_loc.* keys (stn_depth_net.py:58-77), the CHW<->HWC
    flatten permutation on fc_loc.0 is self-inverse, and the reimported
    model computes the SAME function."""
    model = build_model("StnDispNet", use_stn=True)
    x = jnp.zeros((1, 64, 96, 3))
    variables = jax.jit(partial(model.init, train=False))(
        jax.random.PRNGKey(0), x
    )
    params = _randomize(variables["params"], seed=7)
    stats = variables.get("batch_stats", {})

    torch_state = export_torch_state(params, stats, "StnDispNet")
    for key in (
        "localization.0.0.weight", "localization.4.4.weight",
        "fc_loc.0.weight", "fc_loc.6.bias",
        "conv1.0.weight", "conv4.4.bias",
        "upconv_1.0.weight", "upconv_4.1.weight",
        "predict.0.weight",
    ):
        assert key in torch_state, key
    # every flax leaf covered (GroupNorm has no buffers)
    n_leaves = len(jax.tree.leaves(params))
    assert len(torch_state) == n_leaves, (len(torch_state), n_leaves)
    # fc_loc.0 is (out, C*H*W) in torch layout
    assert torch_state["fc_loc.0.weight"].shape[0] == 1280

    params2, _ = import_torch_state(params, stats, torch_state, "StnDispNet")
    for (p1, l1), (p2, l2) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(params2),
    ):
        assert p1 == p2
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                   atol=1e-6, err_msg=str(p1))

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(-1, 1, (1, 64, 96, 3)), jnp.float32)
    out1 = model.apply({"params": params}, img, train=False)
    out2 = model.apply({"params": params2}, img, train=False)
    np.testing.assert_allclose(
        np.asarray(out1[0]), np.asarray(out2[0]), atol=1e-6
    )


def test_stn_dispnet_dead_branch_interop():
    """The reference registers the STN modules unconditionally while its
    forward never calls them (stn_depth_net.py:58-77,107-108), so real
    reference checkpoints ALWAYS carry localization/fc_loc keys. Our
    use_stn=False export synthesizes them (identity transform) for strict
    torch loads; importing such a dict into a use_stn=False model ignores
    the dead branch; and the synthesized branch is a true no-op when a
    use_stn=True model loads it."""
    model_plain = build_model("StnDispNet")
    x = jnp.zeros((1, 64, 96, 3))
    v = jax.jit(partial(model_plain.init, train=False))(
        jax.random.PRNGKey(0), x
    )
    params = _randomize(v["params"], seed=9)

    sd = export_torch_state(params, {}, "StnDispNet")
    assert sd["fc_loc.0.weight"].shape == (1280, 15360)
    np.testing.assert_array_equal(
        sd["fc_loc.6.bias"], np.array([1, 0, 0, 0, 1, 0], np.float32)
    )
    assert "localization.4.3.weight" in sd

    # reimport into the plain model: STN keys ignored, live weights exact
    params2, _ = import_torch_state(params, {}, sd, "StnDispNet")
    for l1, l2 in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-6)

    # import into a use_stn=True model (built at 64x96, NOT the
    # reference's fixed 384x1280 fc_loc resolution): the branch is left
    # at its identity init rather than corrupted -> same function
    model_stn = build_model("StnDispNet", use_stn=True)
    v_stn = jax.jit(partial(model_stn.init, train=False))(
        jax.random.PRNGKey(1), x
    )
    params_stn, _ = import_torch_state(v_stn["params"], {}, sd, "StnDispNet")
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.uniform(-1, 1, (1, 64, 96, 3)), jnp.float32)
    out_plain = model_plain.apply({"params": params2}, img, train=False)
    out_stn = model_stn.apply({"params": params_stn}, img, train=False)
    np.testing.assert_allclose(
        np.asarray(out_plain[0]), np.asarray(out_stn[0]), atol=1e-4
    )


def test_reference_checkpoint_export_roundtrip(tmp_path):
    """export_reference_checkpoint writes the exact dict schema the
    reference saves/resumes ({epoch, dpth_mdl_state_dict,
    pose_mdl_state_dict, optimizer_state_dict, loss, valid_acc},
    /root/reference/trainer.py:129-152): torch.load-able, BN buffers
    present for a strict torch load, tensors reimport identically, and
    the optimizer state loads into a real torch.optim.Adam."""
    import torch

    from unsupervised_pseuso_lidar_tpu.train.checkpoint import (
        count_reference_params,
        export_reference_checkpoint,
    )

    _, dparams, dstats = _init("DispResNet")
    _, pparams, pstats = _init("PoseNet", pose=True)
    dparams = _randomize(dparams, seed=3)
    dstats = jax.tree.map(
        lambda x: np.abs(np.asarray(x)) + 0.1, _randomize(dstats, seed=4)
    )
    pparams = _randomize(pparams, seed=5)
    params = {"depth": dparams, "pose": pparams}
    stats = {"depth": dstats, "pose": pstats}

    path = str(tmp_path / "sfm.pth")
    export_reference_checkpoint(
        params, stats, "DispResNet", "PoseNet", path, epoch=7, lr=2e-4
    )

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    assert set(ckpt) == {
        "epoch", "dpth_mdl_state_dict", "pose_mdl_state_dict",
        "optimizer_state_dict", "loss", "valid_acc",
    }
    assert ckpt["epoch"] == 7
    depth_sd = ckpt["dpth_mdl_state_dict"]
    # BN buffers a strict torch load_state_dict requires
    assert "encoder.encoder.bn1.num_batches_tracked" in depth_sd
    assert depth_sd["encoder.encoder.bn1.num_batches_tracked"].dtype == torch.int64
    assert all(isinstance(v, torch.Tensor) for v in depth_sd.values())

    # tensors reimport identically through the existing import path
    dparams2, dstats2 = import_torch_state(
        dparams, dstats, depth_sd, "DispResNet"
    )
    for l1, l2 in zip(jax.tree.leaves(dparams), jax.tree.leaves(dparams2)):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-6)
    for l1, l2 in zip(jax.tree.leaves(dstats), jax.tree.leaves(dstats2)):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-6)
    pparams2, _ = import_torch_state(
        pparams, pstats, ckpt["pose_mdl_state_dict"], "PoseNet"
    )
    for l1, l2 in zip(jax.tree.leaves(pparams), jax.tree.leaves(pparams2)):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-6)

    # optimizer state: single group over depth+pose learnable tensors
    # (the reference chains both nets into one Adam, trainer.py:70-75)
    opt_sd = ckpt["optimizer_state_dict"]
    n = len(opt_sd["param_groups"][0]["params"])
    assert n == count_reference_params(depth_sd) + count_reference_params(
        ckpt["pose_mdl_state_dict"]
    )
    tparams = [torch.nn.Parameter(torch.zeros(1)) for _ in range(n)]
    opt = torch.optim.Adam(tparams, lr=1e-3)
    opt.load_state_dict(opt_sd)  # must not raise
    assert opt.param_groups[0]["lr"] == 2e-4


@pytest.mark.slow
def test_bts_serving_checkpoint(tmp_path):
    """export_bts_serving_checkpoint writes the {"model": module.*} blob
    the reference ROS node unpickles (DepthPipeline.py:121-127)."""
    import torch

    from unsupervised_pseuso_lidar_tpu.train.checkpoint import (
        export_bts_serving_checkpoint,
    )

    _, params, stats = _init("BtsModel", (1, 32, 32, 3))
    path = str(tmp_path / "model_weights")
    export_bts_serving_checkpoint(params, stats, path)
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    assert set(ckpt) == {"model"}
    assert all(k.startswith("module.") for k in ckpt["model"])
    assert "module.encoder.base_model.conv0.weight" in ckpt["model"]
    # round-trips through the importer (which strips the prefix)
    params2, _ = import_torch_state(params, stats, ckpt["model"], "BtsModel")
    for l1, l2 in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-6)


def test_orbax_save_restore(tmp_path):
    from unsupervised_pseuso_lidar_tpu.train.trainer import create_train_state
    from unsupervised_pseuso_lidar_tpu.train.config import Config

    config = Config.from_dict(
        {
            "model": {"depth": {"name": "StnDispNet"}, "pose": {"name": "PoseNet"}},
            "datasets": {"augmentation": {"image_width": 32, "image_height": 32}},
            "action": {"batch_size": 1},
        }
    )
    state, *_ = create_train_state(config, jax.random.PRNGKey(0), 1)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(state, epoch=3)
    assert mgr.latest_epoch() == 3
    restored, epoch = mgr.restore(state)
    assert epoch == 3
    for l1, l2 in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_allclose(l1, l2)


@pytest.mark.slow
def test_bts_torch_roundtrip_and_function():
    """BTS export->import reproduces tensors AND outputs (catches mapping
    path mistakes: a missing leaf would silently keep old weights)."""
    model, params, stats = _init("BtsModel", (1, 32, 32, 3))
    params = _randomize(params, seed=5)
    stats = jax.tree.map(lambda x: np.abs(np.asarray(x)) + 0.1, _randomize(stats, seed=6))

    torch_state = export_torch_state(params, stats, "BtsModel")
    # every flax param leaf must be covered by the mapping (exported BN
    # num_batches_tracked buffers have no flax counterpart)
    n_leaves = len(jax.tree.leaves(params)) + len(jax.tree.leaves(stats))
    n_buffers = sum(1 for k in torch_state if k.endswith("num_batches_tracked"))
    assert len(torch_state) == n_leaves + n_buffers, (len(torch_state), n_leaves)
    for key in (
        "encoder.base_model.conv0.weight",
        "encoder.base_model.denseblock1.denselayer1.conv1.weight",
        "encoder.base_model.denseblock4.denselayer24.norm2.running_var",
        "encoder.base_model.transition3.conv.weight",
        "encoder.base_model.norm5.weight",
        "decoder.upconv5.conv.weight",
        "decoder.daspp_6.atrous_conv.first_bn.running_mean",
        "decoder.daspp_24.atrous_conv.aconv_sequence.4.weight",
        "decoder.reduc8x8.reduc.inter_128_128.0.weight",
        "decoder.reduc1x1.reduc.final.0.weight",
        "decoder.get_depth.0.weight",
    ):
        assert key in torch_state, key

    params2, stats2 = import_torch_state(params, stats, torch_state, "BtsModel")
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (1, 32, 32, 3)),
                    dtype=jnp.float32)
    out1 = model.apply({"params": params, "batch_stats": stats}, x, train=False)
    out2 = model.apply({"params": params2, "batch_stats": stats2}, x, train=False)
    np.testing.assert_allclose(np.asarray(out1[-1]), np.asarray(out2[-1]), atol=1e-6)
