"""Serving-export tests: StableHLO artifact round-trips, batch
polymorphism, the fused depth->cloud program, and the CLI entry.

The reference has no export/serving-artifact capability (serving =
unpickling torch checkpoints in-process, DepthPipeline.py:122-127);
these tests cover the beyond-reference `pseudolidar/export.py` path.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unsupervised_pseuso_lidar_tpu.models import build_model
from unsupervised_pseuso_lidar_tpu.pseudolidar.export import (
    batch_poly_spec,
    concrete_spec,
    export_program,
    load_exported,
    make_depth_cloud_fn,
    make_depth_fn,
    run_exported,
)

RNG = np.random.default_rng(7)


@pytest.fixture(scope="module")
def depth_setup():
    model = build_model("DispResNet")
    img0 = jnp.zeros((1, 64, 96, 3))
    from functools import partial

    variables = jax.jit(partial(model.init, train=False))(
        jax.random.PRNGKey(0), img0
    )
    fn = make_depth_fn(model, variables)
    return model, variables, fn


def _img(batch):
    return jnp.asarray(
        RNG.uniform(-1, 1, (batch, 64, 96, 3)).astype(np.float32)
    )


class TestExportRoundtrip:
    def test_concrete_roundtrip(self, depth_setup, tmp_path):
        _, _, fn = depth_setup
        img = _img(2)
        path = str(tmp_path / "depth.stablehlo")
        export_program(fn, [concrete_spec(img)], path, platforms=("cpu",))

        got = run_exported(path, img)
        want = jax.jit(fn)(img)
        assert got.shape == (2, 64, 96)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
        )

    def test_sidecar_metadata(self, depth_setup, tmp_path):
        _, _, fn = depth_setup
        img = _img(1)
        path = str(tmp_path / "depth.stablehlo")
        export_program(
            fn, [concrete_spec(img)], path,
            platforms=("cpu",), metadata={"model": "DispResNet"},
        )
        sidecar = json.loads((tmp_path / "depth.stablehlo.json").read_text())
        assert sidecar["model"] == "DispResNet"
        assert sidecar["platforms"] == ["cpu"]
        assert sidecar["inputs"][0]["shape"] == ["1", "64", "96", "3"]
        assert sidecar["outputs"][0]["shape"] == ["1", "64", "96"]
        assert sidecar["size_bytes"] == os.path.getsize(path)
        # weights are baked in: the artifact must carry the ~1M-param
        # encoder/decoder constants, not just the program text
        assert sidecar["size_bytes"] > 1_000_000

    def test_multi_platform_lowering(self, depth_setup, tmp_path):
        # one artifact lowered for both deployment (tpu) and local smoke
        # (cpu) — and still executable on the cpu test backend
        _, _, fn = depth_setup
        img = _img(1)
        path = str(tmp_path / "depth_tpu_cpu.stablehlo")
        export_program(fn, [concrete_spec(img)], path, platforms=("tpu", "cpu"))
        exported = load_exported(path)
        assert set(exported.platforms) == {"tpu", "cpu"}
        got = jax.jit(exported.call)(img)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(jax.jit(fn)(img)), rtol=2e-5, atol=2e-5
        )


class TestBatchPolymorphic:
    def test_one_artifact_many_batches(self, depth_setup, tmp_path):
        _, _, fn = depth_setup
        path = str(tmp_path / "depth_poly.stablehlo")
        export_program(
            fn, [batch_poly_spec(_img(1))], path, platforms=("cpu",)
        )
        exported = load_exported(path)
        assert str(exported.in_avals[0].shape[0]) == "b"
        for batch in (1, 3):
            img = _img(batch)
            got = jax.jit(exported.call)(img)
            assert got.shape == (batch, 64, 96)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(jax.jit(fn)(img)),
                rtol=2e-5, atol=2e-5,
            )


class TestFusedDepthCloud:
    @pytest.fixture
    def calib_dir(self, tmp_path):
        # small-camera calibration sized for the 64x96 test image (see
        # tests/test_pseudolidar.py for the rationale)
        (tmp_path / "calib_cam_to_cam.txt").write_text(
            "K_02: 100 0 48 0 100 32 0 0 1\n"
            "P_rect_02: 100 0 48 0 0 100 32 0 0 0 1 0\n"
            "R_rect_02: 1 0 0 0 1 0 0 0 1\n"
        )
        (tmp_path / "calib_velo_to_cam.txt").write_text(
            "R: 0 -1 0 0 0 -1 1 0 0\nT: 0 0 0\n"
        )
        (tmp_path / "calib_imu_to_velo.txt").write_text(
            "R: 1 0 0 0 1 0 0 0 1\nT: 0 0 0\n"
        )
        return str(tmp_path)

    def test_fused_program(self, depth_setup, calib_dir, tmp_path):
        from unsupervised_pseuso_lidar_tpu.pseudolidar.projector import (
            PseudoLiDAR,
        )

        _, _, fn = depth_setup
        projector = PseudoLiDAR(calib_dir, sparsity=0)
        fused = make_depth_cloud_fn(fn, projector)
        img = _img(2)
        path = str(tmp_path / "depth_cloud.stablehlo")
        export_program(fused, [concrete_spec(img)], path, platforms=("cpu",))

        depth, points, valid = run_exported(path, img)
        assert depth.shape == (2, 64, 96)
        assert points.shape == (2, 64 * 96, 4)
        assert valid.shape == (2, 64 * 96)
        # the artifact's cloud must equal the live two-stage pipeline's
        want_points, want_valid = projector.project_batch(jax.jit(fn)(img))
        np.testing.assert_allclose(
            np.asarray(points), np.asarray(want_points), rtol=2e-5, atol=2e-5
        )
        np.testing.assert_array_equal(np.asarray(valid), np.asarray(want_valid))

    def test_fused_batch_poly(self, depth_setup, calib_dir, tmp_path):
        # symbolic batch through backprojection's reshape(b, -1) path
        from unsupervised_pseuso_lidar_tpu.pseudolidar.projector import (
            PseudoLiDAR,
        )

        _, _, fn = depth_setup
        fused = make_depth_cloud_fn(fn, PseudoLiDAR(calib_dir))
        path = str(tmp_path / "depth_cloud_poly.stablehlo")
        export_program(
            fused, [batch_poly_spec(_img(1))], path, platforms=("cpu",)
        )
        _, points, valid = run_exported(path, _img(3))
        assert points.shape == (3, 64 * 96, 4)
        assert valid.shape == (3, 64 * 96)


class TestArtifactServesPipeline:
    def test_exported_artifact_as_pipeline_depth_fn(self, depth_setup, tmp_path):
        # deployment composition: a batch-polymorphic artifact (no model
        # code) drives the streaming pipeline — including the multi-camera
        # batch-N path — exactly like the live model would
        from unsupervised_pseuso_lidar_tpu.pseudolidar.pipeline import (
            DepthToPointCloudPipeline,
        )
        from unsupervised_pseuso_lidar_tpu.pseudolidar.projector import (
            PseudoLiDAR,
        )

        _, _, fn = depth_setup
        path = str(tmp_path / "depth_poly.stablehlo")
        export_program(fn, [batch_poly_spec(_img(1))], path, platforms=("cpu",))
        program = load_exported(path)

        calib = tmp_path / "calib"
        calib.mkdir()
        (calib / "calib_cam_to_cam.txt").write_text(
            "K_02: 100 0 48 0 100 32 0 0 1\n"
            "P_rect_02: 100 0 48 0 0 100 32 0 0 0 1 0\n"
            "R_rect_02: 1 0 0 0 1 0 0 0 1\n"
        )
        (calib / "calib_velo_to_cam.txt").write_text(
            "R: 0 -1 0 0 0 -1 1 0 0\nT: 0 0 0\n"
        )
        (calib / "calib_imu_to_velo.txt").write_text(
            "R: 1 0 0 0 1 0 0 0 1\nT: 0 0 0\n"
        )

        artifact_pipe = DepthToPointCloudPipeline(
            program.call, PseudoLiDAR(str(calib))
        )
        live_pipe = DepthToPointCloudPipeline(
            jax.jit(fn), PseudoLiDAR(str(calib))
        )
        frames = np.asarray(_img(3))
        got = artifact_pipe.process_batch(frames, 0)
        want = live_pipe.process_batch(frames, 0)
        assert [r.stream_index for r in got] == [0, 1, 2]
        for g, w in zip(got, want):
            np.testing.assert_allclose(g.depth, w.depth, rtol=2e-5, atol=2e-5)
            np.testing.assert_allclose(g.points, w.points, rtol=2e-5, atol=2e-5)


@pytest.mark.slow
class TestBtsExport:
    def test_bts_metric_output_roundtrip(self, tmp_path):
        # the SERVING model: BTS emits metric depth directly (reference
        # model.py:263-272), so the artifact must carry metric_output
        # semantics (no disparity mapping) — and its ~47M DenseNet-161
        # params as baked constants
        import jax

        model = build_model("BtsModel")
        img = _img(1)
        from functools import partial

        variables = jax.jit(partial(model.init, train=False))(
            jax.random.PRNGKey(0), img
        )
        fn = make_depth_fn(model, variables, metric_output=True)
        path = str(tmp_path / "bts.stablehlo")
        export_program(fn, [concrete_spec(img)], path, platforms=("cpu",))
        got = run_exported(path, img)
        want = jax.jit(fn)(img)
        assert got.shape == (1, 64, 96)
        assert float(jnp.max(got)) <= 80.0 and float(jnp.min(got)) >= 0.0
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
        )


class TestExportCli:
    def test_cli_export_verify(self, tmp_path):
        from unsupervised_pseuso_lidar_tpu.cli.export import main

        out = str(tmp_path / "art" / "depth.stablehlo")
        exported = main([
            "--config", "configs/test_config.yaml",
            "--out", out,
            "--height", "64", "--width", "96",
            "--platforms", "cpu",
            "--batch", "2",
            "--verify",
        ])
        assert os.path.exists(out) and os.path.exists(out + ".json")
        assert [str(a.shape) for a in exported.in_avals] == ["(2, 64, 96, 3)"]

    def test_cli_export_torch_format(self, tmp_path):
        # --out *.pth infers --format torch: a reference-loadable
        # training checkpoint (trainer.py:129-152 schema), not StableHLO
        import torch

        from unsupervised_pseuso_lidar_tpu.cli.export import main

        out = str(tmp_path / "sfm.pth")
        ret = main([
            "--config", "configs/test_config.yaml",
            "--out", out,
            "--epoch", "3",
        ])
        assert ret is None and os.path.exists(out)
        ckpt = torch.load(out, map_location="cpu", weights_only=False)
        assert ckpt["epoch"] == 3
        assert "encoder.encoder.conv1.weight" in ckpt["dpth_mdl_state_dict"]
        assert "conv1.0.weight" in ckpt["pose_mdl_state_dict"]
        assert ckpt["optimizer_state_dict"]["param_groups"][0]["params"]

    def test_cli_rejects_empty_checkpoint(self, tmp_path):
        # an explicit --checkpoint that restores nothing must FAIL, not
        # silently export untrained weights labeled with that provenance
        from unsupervised_pseuso_lidar_tpu.cli.export import main

        with pytest.raises(FileNotFoundError, match="no restorable state"):
            main([
                "--config", "configs/test_config.yaml",
                "--out", str(tmp_path / "x.stablehlo"),
                "--checkpoint", str(tmp_path / "no_such_ckpt"),
                "--height", "64", "--width", "96",
                "--platforms", "cpu",
            ])
