"""End-to-end training tests: the minimum slice (SURVEY.md §7 stage 4) —
loss decreases on synthetic data with known geometry — plus multi-device
sharded training on the 8-way virtual CPU mesh, config parsing, metrics,
and checkpoint round trips.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unsupervised_pseuso_lidar_tpu.data.synthetic import (
    SyntheticTripletDataset,
    synthetic_triplet_batch,
)
from unsupervised_pseuso_lidar_tpu.eval.metrics import compute_errors
from unsupervised_pseuso_lidar_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    shard_train_state,
)
from unsupervised_pseuso_lidar_tpu.train.config import Config, load_config
from unsupervised_pseuso_lidar_tpu.train.trainer import (
    Trainer,
    create_train_state,
    make_eval_step,
    make_train_step,
)


def _small_config(**overrides):
    raw = {
        "model": {
            "name": "unit",
            "depth": {"name": "DispResNet"},
            "pose": {"name": "PoseNet"},
        },
        "datasets": {
            "augmentation": {"image_width": 96, "image_height": 64, "shuffle": True},
            "sequence_length": 3,
        },
        "action": {
            "batch_size": 2,
            "num_epochs": 1,
            "random_seed": 0,
            "optimizer": {"depth": {"lr": 1e-4}, "pose": {"lr": 1e-4}},
            "scheduler": {"step_size": 30, "gamma": 0.1},
        },
    }
    raw.update(overrides)
    return Config.from_dict(raw)


class TestConfig:
    def test_reference_schema_roundtrip(self, tmp_path):
        # The reference's own config file parses unchanged.
        import shutil

        ref = "/root/reference/configs/basic_config.yaml"
        if os.path.exists(ref):
            cfg = load_config(ref)
            assert cfg.model.depth.name == "DispResNet"
            assert cfg.model.pose.name == "PoseFc"
            assert cfg.action.batch_size == 4
            assert cfg.action.scheduler.step_size == 30
            assert cfg.image_shape == (384, 1280)

    def test_production_tpu_config_parses(self):
        # configs/tpu_v5e.yaml is the shipped production config: it must
        # select the fast path (pallas warp + bf16) that every headline
        # benchmark number is measured with (VERDICT r2 weak #3)
        cfg = load_config(
            os.path.join(os.path.dirname(__file__), "..",
                         "configs", "tpu_v5e.yaml")
        )
        assert cfg.action.warp_impl == "pallas"
        assert cfg.action.precision == "bf16"
        assert cfg.action.batch_size == 12
        assert cfg.image_shape == (192, 640)

    def test_validation(self):
        with pytest.raises(ValueError):
            _small_config(action={"batch_size": 0})

    def test_validation_split_shape_and_sum(self):
        with pytest.raises(ValueError, match="split"):
            _small_config(action={"split": [1.0]})
        with pytest.raises(ValueError, match="sum to 1"):
            _small_config(action={"split": [0.1, 0.2]})

    def test_validation_rejects_hflip_with_oxts_poses(self):
        # flipped images cannot be warped with unflipped ground-truth
        # OXTS poses (data/augment.py docstring); the combination must be
        # rejected up front, not silently corrupt half of every batch
        with pytest.raises(ValueError, match="hflip"):
            _small_config(
                datasets={"augmentation": {"image_width": 96,
                                           "image_height": 64,
                                           "hflip": True}},
                action={"semi_sup_pose": True},
            )


@pytest.mark.slow
class TestTrainStep:
    def test_loss_decreases_on_synthetic_scene(self):
        config = _small_config()
        state, depth_model, pose_model, tx = create_train_state(
            config, jax.random.PRNGKey(0), steps_per_epoch=10
        )
        step = make_train_step(depth_model, pose_model, tx)
        batch = synthetic_triplet_batch(2, 64, 96, seed=0, depth=10.0)
        batch = {k: jnp.asarray(v) for k, v in batch.items() if k != "groundtruth"}

        losses = []
        for _ in range(8):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], losses

    def test_loss_decreases_bf16(self):
        # the production TPU precision (bf16 model compute, fp32 loss and
        # params — bench.py default): training must converge like fp32
        config = _small_config()
        config.action.precision = "bf16"
        state, depth_model, pose_model, tx = create_train_state(
            config, jax.random.PRNGKey(0), steps_per_epoch=10,
            dtype=jnp.bfloat16,
        )
        step = make_train_step(depth_model, pose_model, tx)
        batch = synthetic_triplet_batch(2, 64, 96, seed=0, depth=10.0)
        batch = {k: jnp.asarray(v) for k, v in batch.items() if k != "groundtruth"}

        losses = []
        for _ in range(8):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], losses
        # params stay fp32 (master weights); only model compute is bf16
        leaf = jax.tree_util.tree_leaves(state.params)[0]
        assert leaf.dtype == jnp.float32

    def test_semi_sup_pose_uses_oxts(self):
        config = _small_config()
        state, depth_model, pose_model, tx = create_train_state(
            config, jax.random.PRNGKey(0), steps_per_epoch=10
        )
        step = make_train_step(depth_model, pose_model, tx, semi_sup_pose=True)
        batch = synthetic_triplet_batch(2, 64, 96, seed=0)
        batch = {k: jnp.asarray(v) for k, v in batch.items() if k != "groundtruth"}
        state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))

    def test_eval_step_metrics(self):
        config = _small_config()
        state, depth_model, pose_model, _ = create_train_state(
            config, jax.random.PRNGKey(0), steps_per_epoch=10
        )
        eval_step = make_eval_step(depth_model, pose_model)
        batch = synthetic_triplet_batch(2, 64, 96, seed=0)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        metrics, depth_pred = eval_step(state, batch)
        assert depth_pred.shape == (2, 64, 96)
        for key in ("abs_rel", "rms", "d1", "silog"):
            assert np.isfinite(float(metrics[key])), key


@pytest.mark.slow
class TestMultiChip:
    def test_sharded_train_step_8_devices(self):
        assert len(jax.devices()) >= 8, "conftest must fake 8 CPU devices"
        mesh = make_mesh(8)
        config = _small_config()
        state, depth_model, pose_model, tx = create_train_state(
            config, jax.random.PRNGKey(0), steps_per_epoch=10
        )
        state = shard_train_state(mesh, state)
        step = make_train_step(depth_model, pose_model, tx, mesh=mesh)
        batch = synthetic_triplet_batch(8, 64, 96, seed=0)
        batch = {k: jnp.asarray(v) for k, v in batch.items() if k != "groundtruth"}
        batch = shard_batch(mesh, batch)
        state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))
        # params stay replicated
        leaf = jax.tree.leaves(state.params)[0]
        assert leaf.sharding.is_fully_replicated

    def test_sharded_supervised_term(self):
        # the supervised path adds a [B, H, W] groundtruth key to the
        # train batch: it must shard over "data" like the images and the
        # masked-L1 reduction must psum correctly across devices
        mesh = make_mesh(8)
        config = _small_config()
        state, dm, pm, tx = create_train_state(
            config, jax.random.PRNGKey(0), steps_per_epoch=10
        )
        batch = synthetic_triplet_batch(8, 64, 96, seed=0, slant_deg=10.0)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}

        step1 = make_train_step(dm, pm, tx, donate=False,
                                supervised_weight=1.0)
        _, m1 = step1(state, batch)

        sharded = shard_train_state(mesh, state)
        step8 = make_train_step(dm, pm, tx, mesh=mesh, donate=False,
                                supervised_weight=1.0)
        _, m8 = step8(sharded, shard_batch(mesh, batch))
        np.testing.assert_allclose(
            float(m1["supervised_loss"]), float(m8["supervised_loss"]),
            rtol=2e-4,
        )
        np.testing.assert_allclose(
            float(m1["loss"]), float(m8["loss"]), rtol=2e-4
        )

    def test_sharded_matches_single_device(self):
        # Same batch, same init: sharded and unsharded steps agree.
        config = _small_config()
        batch = synthetic_triplet_batch(8, 64, 96, seed=3)
        batch = {k: jnp.asarray(v) for k, v in batch.items() if k != "groundtruth"}

        state1, dm, pm, tx = create_train_state(
            config, jax.random.PRNGKey(0), steps_per_epoch=10
        )
        step1 = make_train_step(dm, pm, tx, donate=False)
        _, m1 = step1(state1, batch)

        mesh = make_mesh(8)
        state2, dm2, pm2, tx2 = create_train_state(
            config, jax.random.PRNGKey(0), steps_per_epoch=10
        )
        state2 = shard_train_state(mesh, state2)
        step2 = make_train_step(dm2, pm2, tx2, mesh=mesh, donate=False)
        _, m2 = step2(state2, shard_batch(mesh, batch))
        np.testing.assert_allclose(
            float(m1["loss"]), float(m2["loss"]), rtol=2e-4
        )


@pytest.mark.slow
class TestTrainerLoop:
    def test_fit_epoch_and_checkpoint(self, tmp_path):
        config = _small_config()
        config.action.checkpoint_dir = str(tmp_path)
        config.action.num_epochs = 1
        config.action.eval_pose = True  # pose metrics ride validation
        dataset = SyntheticTripletDataset(2, 2, 64, 96, seed=0)
        trainer = Trainer(config, dataset=dataset)
        metrics = trainer.fit(
            make_train_iter=dataset.batches,
            make_val_iter=lambda: dataset.batches(99),
        )
        assert "loss" in metrics and np.isfinite(metrics["loss"])
        assert "val_abs_rel" in metrics
        assert "val_pose_ate" in metrics and np.isfinite(
            metrics["val_pose_ate"]
        )
        assert "val_pose_rot_err_deg" in metrics
        # resume restores epoch + state
        config2 = _small_config()
        config2.action.checkpoint_dir = str(tmp_path)
        config2.action.from_scratch = False
        trainer2 = Trainer(config2, dataset=dataset)
        # epoch 0 completed and was checkpointed -> resume at epoch 1
        # (resuming AT the saved index would re-train the finished epoch)
        assert trainer2.epoch == 1
        assert int(trainer2.state.step) == int(trainer.state.step)
        # fit() with num_epochs=1 therefore has nothing left to do
        again = trainer2.fit(make_train_iter=dataset.batches)
        assert int(trainer2.state.step) == int(trainer.state.step), again


class TestMetrics:
    def test_perfect_prediction(self):
        gt = jnp.asarray(np.random.default_rng(0).uniform(1, 50, (2, 8, 8)))
        m = compute_errors(gt, gt)
        assert float(m["abs_rel"]) < 1e-6
        assert float(m["d1"]) == 1.0
        assert float(m["rms"]) < 1e-4

    def test_sq_rel_is_not_rms(self):
        # Reference bug (evaluate.py:36) fixed: sq_rel is its own metric.
        gt = jnp.full((4, 4), 10.0)
        pred = jnp.full((4, 4), 12.0)
        m = compute_errors(gt, pred)
        np.testing.assert_allclose(float(m["rms"]), 2.0, atol=1e-5)
        np.testing.assert_allclose(float(m["sq_rel"]), 4.0 / 10.0, atol=1e-5)

    def test_mask_excludes_invalid(self):
        gt = jnp.asarray([[10.0, 0.0], [10.0, 0.0]])  # zeros = no LiDAR return
        pred = jnp.asarray([[10.0, 99.0], [10.0, 99.0]])
        m = compute_errors(gt, pred)
        assert float(m["abs_rel"]) < 1e-6

    def test_median_scale_removes_global_scale(self):
        # the standard monocular protocol: a prediction off by a constant
        # factor (learned-pose scale ambiguity) scores perfectly after
        # median scaling, and badly without it
        gt = jnp.asarray(np.random.default_rng(1).uniform(5, 50, (2, 8, 8)))
        pred = gt / 100.0
        raw = compute_errors(gt, pred)
        scaled = compute_errors(gt, pred, median_scale=True)
        assert float(raw["abs_rel"]) > 0.9
        assert float(scaled["abs_rel"]) < 1e-5
        assert float(scaled["d1"]) == 1.0
        # masked pixels must not influence the median
        gt_sparse = gt.at[:, :, 0].set(0.0)
        pred_bad_at_invalid = (gt_sparse / 100.0).at[:, :, 0].set(1e6)
        scaled2 = compute_errors(
            gt_sparse, pred_bad_at_invalid, median_scale=True
        )
        assert float(scaled2["abs_rel"]) < 1e-4

    def test_eigen_protocol_crops_and_scales(self):
        # eval_protocol='eigen' (VERDICT r1 task 5): Garg crop excludes
        # the sky rows, caps at 80 m, median-scales per image
        from unsupervised_pseuso_lidar_tpu.eval.metrics import eigen_crop_mask
        from unsupervised_pseuso_lidar_tpu.train.trainer import make_eval_step

        h, w = 40, 64
        crop = np.asarray(eigen_crop_mask(h, w))
        # crop removes the top ~40% (sky) and the side margins
        assert not crop[: int(0.40 * h)].any()
        assert crop[int(0.45 * h) : int(0.95 * h), w // 2].all()
        assert not crop[:, 0].any() and not crop[:, -1].any()

        rng = np.random.default_rng(5)
        gt = jnp.asarray(rng.uniform(5, 50, (2, h, w)))
        pred = gt / 100.0  # global-scale-ambiguous prediction
        # corrupt pred ONLY outside the crop: protocol metrics must ignore it
        pred_bad = np.array(pred)
        pred_bad[:, : int(0.40 * h)] = 1e6
        mask = jnp.broadcast_to(crop, gt.shape) & (gt > 1e-3) & (gt < 80.0)
        m = compute_errors(gt, jnp.asarray(pred_bad), mask=mask, median_scale=True)
        assert float(m["abs_rel"]) < 1e-5
        assert float(m["d1"]) == 1.0

        # the trainer wiring: config.action.eval_protocol flows through
        config = _small_config()
        config.action.eval_protocol = "eigen"
        state, dm, pm, _tx = create_train_state(config, jax.random.PRNGKey(0), 10)
        step = make_eval_step(dm, pm, eval_protocol="eigen")
        raw = synthetic_triplet_batch(2, 64, 96, seed=0)
        batch = {k: jnp.asarray(v) for k, v in raw.items()}
        metrics, _depth = step(state, batch)
        assert np.isfinite(float(metrics["abs_rel"]))
        assert np.isfinite(float(metrics["loss"]))


class TestSlantedScene:
    def test_slant_zero_matches_legacy_constant_plane(self):
        a = synthetic_triplet_batch(1, 16, 24, seed=3)
        b = synthetic_triplet_batch(1, 16, 24, seed=3, slant_deg=0.0)
        for key in ("tgt", "ref_imgs", "groundtruth"):
            np.testing.assert_allclose(a[key], b[key], atol=1e-5)
        assert float(np.ptp(a["groundtruth"])) == 0.0  # constant plane

    def test_slanted_scene_is_geometrically_consistent(self):
        # the slanted-plane renderer must satisfy the warp equation: warping
        # ref0 with the GT depth and GT pose reproduces the target almost
        # exactly, and beats the zero-pose warp by a wide margin
        from unsupervised_pseuso_lidar_tpu.geometry.warp import inverse_warp

        raw = synthetic_triplet_batch(1, 48, 64, seed=5, slant_deg=10.0)
        gt = jnp.asarray(raw["groundtruth"])
        assert float(np.ptp(raw["groundtruth"])) > 1.0  # depth varies
        tgt = jnp.asarray(raw["tgt"])
        ref0 = jnp.asarray(raw["ref_imgs"][:, 0])
        pose = jnp.asarray(raw["oxts"][:, 0])
        warped = inverse_warp(ref0, gt, pose, jnp.asarray(raw["intrinsics"]))
        interior = (slice(None), slice(8, -8), slice(8, -8))
        err_aligned = float(jnp.abs(warped - tgt)[interior].mean())
        err_identity = float(jnp.abs(ref0 - tgt)[interior].mean())
        assert err_aligned < 0.01, err_aligned
        assert err_aligned < err_identity / 5


@pytest.mark.slow
class TestToyProblem:
    def test_depth_only_training_converges_toward_gt(self):
        # The controlled-geometry oracle (SURVEY.md §4 toy problem): with
        # ground-truth poses and a well-conditioned smoothness term, the
        # depth net must move toward the true plane depth.
        import sys, os
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
        from toy_problem import run

        errors = run(steps=150, batch=4, height=64, width=96, verbose=False)
        assert errors[-1] < errors[0], errors


class TestDinoTurntable:
    def test_loader_geometry(self):
        # The reference's OTHER toy dataset (36 real photos, calibrated
        # projection matrices; notes/toy_problem/dataloaders.py:32-54).
        # Validates the chirality-fixed P = K [R | t] factorization end
        # to end: ground-truth warps must beat the identity warp.
        import sys, os
        sys.path.insert(
            0, os.path.join(os.path.dirname(__file__), "..", "examples")
        )
        from dino_turntable import load_dino

        data = load_dino(height=96, width=128)
        if data is None:
            pytest.skip("dino data or scipy unavailable")
        num = data["tgt"].shape[0]
        assert data["ref_imgs"].shape == (num, 2, 96, 128, 3)
        k = data["intrinsics"]
        assert (k[:, 0, 0] > 0).all()
        assert np.allclose(k[:, 2, 2], 1.0)
        # the turntable steps exactly 10 degrees (36 views / full turn):
        # every GT relative pose must be a 2*pi/36 rotation, and the
        # camera-to-axis distance must make the translation norms equal
        # across the whole sequence (rigid turntable). This pins both
        # the chirality-fixed factorization and the relative-pose chain.
        angles = np.linalg.norm(data["oxts"][:, :, :3], axis=-1)
        np.testing.assert_allclose(
            angles, 2 * np.pi / 36, rtol=2e-2
        )
        trans = np.linalg.norm(data["oxts"][:, :, 3:], axis=-1)
        np.testing.assert_allclose(trans, trans.mean(), rtol=5e-2)


@pytest.mark.slow
class TestSpatialSharding:
    def test_2d_mesh_data_spatial(self):
        # ("data", "spatial") mesh: batch over data, image H over spatial;
        # GSPMD partitions the convolutions with halo exchange.
        mesh = make_mesh(8, spatial=2)
        assert mesh.axis_names == ("data", "spatial")
        config = _small_config()
        state, dm, pm, tx = create_train_state(
            config, jax.random.PRNGKey(0), steps_per_epoch=10
        )
        state = shard_train_state(mesh, state)
        step = make_train_step(dm, pm, tx, mesh=mesh)
        batch = synthetic_triplet_batch(4, 64, 96, seed=0)
        batch = {k: jnp.asarray(v) for k, v in batch.items() if k != "groundtruth"}
        batch = shard_batch(mesh, batch)
        assert "spatial" in str(batch["tgt"].sharding.spec)
        state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
class TestAccumAndRemat:
    def test_grad_accumulation_matches_full_batch(self):
        # accum over 2 micro-batches ~ one step on the full batch (BN stats
        # paths differ slightly; losses must be close).
        config = _small_config()
        batch = synthetic_triplet_batch(4, 64, 96, seed=1)
        batch = {k: jnp.asarray(v) for k, v in batch.items() if k != "groundtruth"}

        s1, dm, pm, tx = create_train_state(config, jax.random.PRNGKey(0), 10)
        full = make_train_step(dm, pm, tx, donate=False)
        s1b, m1 = full(s1, batch)

        s2, dm2, pm2, tx2 = create_train_state(config, jax.random.PRNGKey(0), 10)
        accum = make_train_step(dm2, pm2, tx2, accum_steps=2, donate=False)
        s2b, m2 = accum(s2, batch)
        assert np.isfinite(float(m2["loss"]))
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=0.1)

    def test_remat_step_matches_plain(self):
        config = _small_config()
        batch = synthetic_triplet_batch(2, 64, 96, seed=2)
        batch = {k: jnp.asarray(v) for k, v in batch.items() if k != "groundtruth"}
        s1, dm, pm, tx = create_train_state(config, jax.random.PRNGKey(0), 10)
        plain = make_train_step(dm, pm, tx, donate=False)
        _, m1 = plain(s1, batch)
        s2, dm2, pm2, tx2 = create_train_state(config, jax.random.PRNGKey(0), 10)
        remat = make_train_step(dm2, pm2, tx2, remat=True, donate=False)
        _, m2 = remat(s2, batch)
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)


class TestOptimizerLrSplit:
    """Per-net learning rates must route through optax.multi_transform
    so depth and pose nets honor their configured lrs independently."""

    def _tree(self):
        k = jax.random.PRNGKey(3)
        return {
            "depth": {
                "conv": {"kernel": jax.random.normal(k, (3, 3, 4, 8)),
                         "bias": jnp.zeros((8,))},
            },
            "pose": {"w": jax.random.normal(jax.random.PRNGKey(4), (5, 6))},
        }

    def test_multi_transform_lr_split(self):
        import optax
        from unsupervised_pseuso_lidar_tpu.train.config import Config
        from unsupervised_pseuso_lidar_tpu.train.trainer import make_optimizer

        cfg = _small_config()
        cfg.action.optimizer.depth_lr = 1e-4
        cfg.action.optimizer.pose_lr = 2e-4
        tx = make_optimizer(cfg, steps_per_epoch=10)
        params = self._tree()
        grads = jax.tree.map(jnp.ones_like, params)
        state = tx.init(params)
        updates, state = tx.update(grads, state, params)
        # Adam on all-ones grads: first update magnitude == lr per label
        got_depth = float(
            jnp.max(jnp.abs(updates["depth"]["conv"]["kernel"]))
        )
        got_pose = float(jnp.max(jnp.abs(updates["pose"]["w"])))
        np.testing.assert_allclose(got_depth, 1e-4, rtol=1e-3)
        np.testing.assert_allclose(got_pose, 2e-4, rtol=1e-3)


def test_distributed_initialize_noop_without_env(monkeypatch):
    from unsupervised_pseuso_lidar_tpu.parallel.distributed import initialize

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert initialize() is False


@pytest.mark.slow
class TestAugmentation:
    def test_color_jitter_is_triplet_consistent(self):
        from unsupervised_pseuso_lidar_tpu.data.augment import color_jitter

        rng = jax.random.PRNGKey(0)
        tgt = jnp.ones((3, 8, 8, 3))
        refs = jnp.ones((3, 2, 8, 8, 3))
        tgt2, refs2 = color_jitter(rng, tgt, refs)
        # same affine transform across tgt/ref0/ref1 of each sample
        np.testing.assert_allclose(
            np.asarray(tgt2), np.asarray(refs2[:, 0]), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(refs2[:, 0]), np.asarray(refs2[:, 1]), atol=1e-6
        )
        # but different across samples
        assert not np.allclose(np.asarray(tgt2[0]), np.asarray(tgt2[1]))

    def test_hflip_mirrors_cx(self):
        from unsupervised_pseuso_lidar_tpu.data.augment import horizontal_flip

        rng = jax.random.PRNGKey(1)
        batch, width = 8, 16
        tgt = jnp.asarray(
            np.random.default_rng(0).uniform(0, 1, (batch, 8, width, 3)),
            dtype=jnp.float32,
        )
        refs = jnp.stack([tgt, tgt], axis=1)
        k = jnp.broadcast_to(
            jnp.asarray([[100.0, 0, 5.0], [0, 100.0, 4.0], [0, 0, 1]]),
            (batch, 3, 3),
        )
        tgt2, refs2, k2, flipped = horizontal_flip(rng, tgt, refs, k, prob=1.0)
        np.testing.assert_allclose(
            np.asarray(tgt2), np.asarray(tgt[:, :, ::-1, :]), atol=1e-7
        )
        np.testing.assert_allclose(np.asarray(k2[:, 0, 2]), width - 1 - 5.0)
        np.testing.assert_allclose(np.asarray(k2[:, 1, 2]), 4.0)
        assert np.asarray(flipped).all()

    def test_hflip_pose_mirror_algebra(self):
        # the 6-vec mirror rule used by augment_batch is the exact
        # conjugation by M = diag(-1,1,1): pose_matrix(v') = M T M
        from unsupervised_pseuso_lidar_tpu.geometry.se3 import pose_matrix

        rng = np.random.default_rng(5)
        v = jnp.asarray(rng.normal(scale=0.4, size=(6, 6)), jnp.float32)
        mirror_vec = jnp.asarray([1, -1, -1, -1, 1, 1], jnp.float32)
        m = np.diag([-1.0, 1.0, 1.0, 1.0]).astype(np.float32)
        got = np.asarray(pose_matrix(v * mirror_vec))
        want = m @ np.asarray(pose_matrix(v)) @ m
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_hflip_keeps_loss_at_ground_truth(self):
        # full geometric consistency: flipping images + cx + GT poses
        # together leaves the photometric error at ground truth unchanged
        # (flipped warps are mirror images of unflipped warps)
        from unsupervised_pseuso_lidar_tpu.data.augment import horizontal_flip
        from unsupervised_pseuso_lidar_tpu.losses.reprojection import (
            reprojection_loss,
        )

        raw = synthetic_triplet_batch(2, 32, 64, seed=1, slant_deg=8.0)
        tgt = jnp.asarray(raw["tgt"])
        refs = jnp.asarray(raw["ref_imgs"])
        k = jnp.asarray(raw["intrinsics"])
        oxts = jnp.asarray(raw["oxts"])
        depth = jnp.asarray(raw["groundtruth"])[..., None]

        def loss(tgt, refs, k, oxts, depth):
            return float(reprojection_loss(
                tgt, [refs[:, 0], refs[:, 1]], [[depth], [depth]],
                oxts, k, mode="mean",
            ))

        base = loss(tgt, refs, k, oxts, depth)
        ftgt, frefs, fk, _ = horizontal_flip(
            jax.random.PRNGKey(0), tgt, refs, k, prob=1.0
        )
        mirror_vec = jnp.asarray([1, -1, -1, -1, 1, 1], jnp.float32)
        foxts = oxts * mirror_vec
        fdepth = depth[:, :, ::-1]
        flipped = loss(ftgt, frefs, fk, foxts, fdepth)
        assert abs(flipped - base) < 0.02 * base + 1e-4, (base, flipped)
        # and with UNmirrored poses the loss must blow up (the bug the
        # mirror rule prevents)
        wrong = loss(ftgt, frefs, fk, oxts, fdepth)
        assert wrong > 2.0 * base, (base, wrong)

    def test_train_step_with_augmentation_and_uint8(self):
        config = _small_config()
        config.datasets.augmentation.color_jitter = True
        config.datasets.augmentation.hflip = True
        state, dm, pm, tx = create_train_state(config, jax.random.PRNGKey(0), 10)
        step = make_train_step(dm, pm, tx, color_jitter=True, hflip=True)
        raw = synthetic_triplet_batch(2, 64, 96, seed=0)
        batch = {
            "tgt": jnp.asarray((raw["tgt"] * 255).astype(np.uint8)),
            "ref_imgs": jnp.asarray((raw["ref_imgs"] * 255).astype(np.uint8)),
            "intrinsics": jnp.asarray(raw["intrinsics"]),
            "oxts": jnp.asarray(raw["oxts"]),
        }
        losses = []
        for _ in range(3):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        # augmentation varies per step (rng keyed on state.step)
        assert len({round(l, 6) for l in losses}) > 1


@pytest.mark.slow
class TestLossModesAndKwargs:
    def test_min_mode_trains(self):
        config = _small_config()
        state, dm, pm, tx = create_train_state(config, jax.random.PRNGKey(0), 10)
        step = make_train_step(dm, pm, tx, loss_mode="min")
        batch = synthetic_triplet_batch(2, 64, 96, seed=0)
        batch = {k: jnp.asarray(v) for k, v in batch.items() if k != "groundtruth"}
        state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))

    def test_supervised_depth_term(self):
        # optional sparse-LiDAR supervision (action.supervised_weight):
        # the reference's loss receives gt but never uses it
        # (losses.py:262-271); here a masked L1 in meters joins the
        # objective and its metric must drop under training
        config = _small_config()
        state, dm, pm, tx = create_train_state(config, jax.random.PRNGKey(0), 10)
        raw = synthetic_triplet_batch(2, 64, 96, seed=0, slant_deg=10.0)
        batch = {k: jnp.asarray(v) for k, v in raw.items()}
        # sparsify the GT like LiDAR returns (~10% of pixels)
        rng = np.random.default_rng(0)
        keep = rng.uniform(size=raw["groundtruth"].shape) < 0.1
        batch["groundtruth"] = batch["groundtruth"] * keep

        # strong weight so the LiDAR term dominates the gradient within a
        # few steps (at init the depth head sits ~0.2 m vs 6-23 m GT;
        # well-conditioned disparity smoothing as in the benchmarks)
        # donate=False: the init state is reused for the weight-0
        # comparison below (donation would free its buffers)
        step = make_train_step(dm, pm, tx, donate=False,
                               supervised_weight=100.0,
                               smooth_on="disp", smooth_weight=1e-3)
        sups = []
        s = state
        for _ in range(15):
            s, metrics = step(s, batch)
            sups.append(float(metrics["supervised_loss"]))
        assert np.isfinite(sups).all()
        assert sups[-1] < 0.7 * sups[0], sups

        # weight 0 (the default/reference behavior): gt present but the
        # metric is absent and the loss equals the unsupervised one
        step0 = make_train_step(dm, pm, tx, donate=False)
        _, m0 = step0(state, batch)
        assert "supervised_loss" not in m0
        stepw = make_train_step(dm, pm, tx, donate=False,
                                supervised_weight=1.0)
        _, mw = stepw(state, batch)
        assert float(mw["loss"]) > float(m0["loss"])

    def test_hflip_mirrors_groundtruth(self):
        # supervised training + flip augmentation: the sparse GT must
        # mirror with the SAME per-sample decisions as the images
        from unsupervised_pseuso_lidar_tpu.data.augment import augment_batch

        rng = np.random.default_rng(3)
        batch = {
            "tgt": jnp.asarray(rng.uniform(0, 1, (8, 8, 16, 3)), jnp.float32),
            "ref_imgs": jnp.asarray(
                rng.uniform(0, 1, (8, 2, 8, 16, 3)), jnp.float32
            ),
            "intrinsics": jnp.broadcast_to(
                jnp.asarray([[100.0, 0, 8], [0, 100.0, 4], [0, 0, 1]]),
                (8, 3, 3),
            ),
            "groundtruth": jnp.asarray(
                rng.uniform(1, 50, (8, 8, 16)), jnp.float32
            ),
        }
        out = augment_batch(jnp.asarray(0), batch, jitter=False, flip=True)
        tgt_in = np.asarray(batch["tgt"])
        tgt_out = np.asarray(out["tgt"])
        gt_in = np.asarray(batch["groundtruth"])
        gt_out = np.asarray(out["groundtruth"])
        flipped_any = 0
        for b in range(8):
            was_flipped = np.allclose(tgt_out[b], tgt_in[b, :, ::-1, :])
            if was_flipped and not np.allclose(tgt_out[b], tgt_in[b]):
                flipped_any += 1
                np.testing.assert_allclose(gt_out[b], gt_in[b, :, ::-1])
            else:
                np.testing.assert_allclose(gt_out[b], gt_in[b])
        assert flipped_any > 0  # prob 0.5 over 8 samples: flips happened

    def test_model_kwargs_from_yaml(self):
        # extra model.depth keys flow into the constructor (all_scales)
        config = _small_config(
            model={
                "name": "kw",
                "depth": {"name": "DispResNet", "all_scales": True},
                "pose": {"name": "PoseNet"},
            }
        )
        assert config.model.depth.kwargs == {"all_scales": True}
        state, dm, pm, tx = create_train_state(config, jax.random.PRNGKey(0), 10)
        step = make_train_step(dm, pm, tx)
        batch = synthetic_triplet_batch(2, 64, 96, seed=0)
        batch = {k: jnp.asarray(v) for k, v in batch.items() if k != "groundtruth"}
        state, metrics = step(state, batch)  # 4-scale loss pyramid
        assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
class TestMultiStep:
    def test_multi_step_matches_sequential(self):
        from unsupervised_pseuso_lidar_tpu.train.trainer import make_multi_step

        config = _small_config()
        raws = [synthetic_triplet_batch(2, 64, 96, seed=i) for i in range(2)]
        single_batches = [
            {k: jnp.asarray(v) for k, v in r.items() if k != "groundtruth"}
            for r in raws
        ]
        stacked = {
            k: jnp.stack([b[k] for b in single_batches])
            for k in single_batches[0]
        }

        s1, dm, pm, tx = create_train_state(config, jax.random.PRNGKey(0), 10)
        step = make_train_step(dm, pm, tx, donate=False)
        for b in single_batches:
            s1, m1 = step(s1, b)

        s2, dm2, pm2, tx2 = create_train_state(config, jax.random.PRNGKey(0), 10)
        multi = make_multi_step(dm2, pm2, tx2, num_steps=2)
        s2, m2 = multi(s2, stacked)

        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
        assert int(s1.step) == int(s2.step) == 2
        # scan vs sequential compile to slightly different fusions; params
        # agree to float32 tolerance
        for l1, l2 in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
            np.testing.assert_allclose(l1, l2, rtol=1e-3, atol=2e-4)


@pytest.mark.slow
class TestMultiStepMesh:
    def test_multi_step_mesh_matches_sequential_sharded(self):
        # VERDICT r1 task 4: make_multi_step(mesh) == sequential sharded
        # steps — the production scan driver scales out.
        from unsupervised_pseuso_lidar_tpu.train.trainer import make_multi_step

        assert len(jax.devices()) >= 8
        mesh = make_mesh(8)
        config = _small_config()
        config.action.batch_size = 8
        raws = [synthetic_triplet_batch(8, 64, 96, seed=i) for i in range(2)]
        batches = [
            {k: jnp.asarray(v) for k, v in r.items() if k != "groundtruth"}
            for r in raws
        ]
        stacked = {
            k: jnp.stack([b[k] for b in batches]) for k in batches[0]
        }

        s1, dm, pm, tx = create_train_state(config, jax.random.PRNGKey(0), 10)
        s1 = shard_train_state(mesh, s1)
        step = make_train_step(dm, pm, tx, mesh=mesh, donate=False)
        for b in batches:
            s1, m1 = step(s1, shard_batch(mesh, b))

        s2, dm2, pm2, tx2 = create_train_state(config, jax.random.PRNGKey(0), 10)
        s2 = shard_train_state(mesh, s2)
        multi = make_multi_step(dm2, pm2, tx2, num_steps=2, mesh=mesh,
                                donate=False)
        # [num_steps, B, ...]: the batch dim (axis 1) carries the "data"
        # sharding; shard_batch's batch_sharding targets axis 0, so place
        # explicitly here
        from jax.sharding import NamedSharding, PartitionSpec as P

        stacked = {
            k: jax.device_put(
                v, NamedSharding(mesh, P(None, "data"))
            )
            for k, v in stacked.items()
        }
        s2, m2 = multi(s2, stacked)

        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                   rtol=1e-4)
        assert int(s1.step) == int(s2.step) == 2
        for l1, l2 in zip(jax.tree.leaves(s1.params),
                          jax.tree.leaves(s2.params)):
            np.testing.assert_allclose(l1, l2, rtol=1e-3, atol=2e-4)
        # outputs stay replicated (ready for the next scan launch)
        leaf = jax.tree.leaves(s2.params)[0]
        assert leaf.sharding.is_fully_replicated


class TestShardedValidate:
    @pytest.mark.slow  # ~28s warm: 8-device mesh compile of the eval step
    def test_validate_uses_mesh_placement(self, tmp_path):
        assert len(jax.devices()) >= 8
        mesh = make_mesh(8)
        config = _small_config()
        config.action.batch_size = 8
        config.action.checkpoint_dir = str(tmp_path)
        from unsupervised_pseuso_lidar_tpu.train.trainer import Trainer

        trainer = Trainer(config, mesh=mesh)
        raw = synthetic_triplet_batch(8, 64, 96, seed=0)
        batch = {k: jnp.asarray(v) for k, v in raw.items()}
        assert "groundtruth" in batch
        metrics = trainer.validate([batch])
        assert np.isfinite(metrics["loss"])
        assert "abs_rel" in metrics

        # parity with an unsharded trainer on the same batch + same init
        trainer2 = Trainer(config, mesh=None)
        metrics2 = trainer2.validate([batch])
        np.testing.assert_allclose(metrics["loss"], metrics2["loss"],
                                   rtol=2e-4)
        np.testing.assert_allclose(metrics["abs_rel"], metrics2["abs_rel"],
                                   rtol=2e-4, atol=1e-6)


class TestCollapseWarning:
    """The zeros-warp trivial-solution guard (Trainer._warn_if_collapsed):
    coverage EXACTLY 0.0 means every sample projects out of frame, the
    photometric gradient is dead, and training cannot recover (measured in
    benchmarks/reference_loop.py --objective reference)."""

    def _bare_trainer(self):
        from unsupervised_pseuso_lidar_tpu.train.trainer import Trainer

        return Trainer.__new__(Trainer)  # guard needs no trainer state

    def test_warns_once_on_zero_coverage(self, capsys):
        t = self._bare_trainer()
        t._warn_if_collapsed({"band_coverage": 0.0, "loss": 0.567})
        assert "zeros-warp" in capsys.readouterr().out
        t._warn_if_collapsed({"band_coverage": 0.0, "loss": 0.567})
        assert capsys.readouterr().out == ""  # once per run, not per epoch

    def test_silent_on_healthy_coverage(self, capsys):
        t = self._bare_trainer()
        t._warn_if_collapsed({"band_coverage": 0.77, "col_coverage": 0.94})
        t._warn_if_collapsed({})  # gather impl: no coverage metrics at all
        assert capsys.readouterr().out == ""
