"""Utility-module tests: profiling, visualization, logging."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from unsupervised_pseuso_lidar_tpu.utils.profiling import StepTimer, annotate, trace
from unsupervised_pseuso_lidar_tpu.utils.transforms import (
    load_image,
    load_image_uint8,
    normalize_image,
    unnormalize_image,
)
from unsupervised_pseuso_lidar_tpu.utils.visualization import (
    depth_to_image,
    image_to_uint8,
    save_warp_visualization,
)


def test_metric_logger_images_and_histograms():
    # wandb-off: every surface is a silent no-op; wandb-on (faked): images
    # and per-layer histograms are forwarded (reference trainer.py:118-127,
    # 204-212 — wandb.watch + log_depth_predictions parity)
    from unsupervised_pseuso_lidar_tpu.utils.logging import MetricLogger

    logger = MetricLogger(None)
    logger({"loss": 1.0}, step=1)
    logger.log_images({"depth": np.zeros((4, 4, 3), np.uint8)}, step=1)
    logger.log_param_histograms({"w": jnp.ones((3,))}, step=1)

    class FakeWandb:
        def __init__(self):
            self.logged = []

        def Image(self, x):
            return ("img", np.shape(x))

        def Histogram(self, x):
            return ("hist", len(x))

        def log(self, payload, step=None):
            self.logged.append((payload, step))

    fake = FakeWandb()
    logger._wandb = fake
    logger.log_images({"depth": np.zeros((4, 4, 3), np.uint8)}, step=2)
    logger.log_param_histograms({"depth": {"w": jnp.ones((6,))}}, step=2)
    assert fake.logged[0][0]["depth"][0] == "img"
    hist_payload = fake.logged[1][0]
    assert any(k.startswith("params/") for k in hist_payload)


def test_op_breakdown_returns_per_family_ms(tmp_path):
    # trace capture + xplane parse (the tool behind docs/DESIGN.md §8a);
    # on the CPU backend XLA ops land on the host plane — the summary must
    # still parse and return a dict of ms/step
    from unsupervised_pseuso_lidar_tpu.utils.trace import (
        _op_family,
        op_breakdown,
    )

    assert _op_family("%fusion.123 = bf16[2,2] fusion(...)") == "fusion"
    assert _op_family("copy-start.4") == "copy-start"

    @jax.jit
    def f(x):
        return jnp.sin(x @ x).sum()

    result = op_breakdown(
        f, jnp.ones((64, 64)), steps=2, trace_dir=str(tmp_path), verbose=False
    )
    assert isinstance(result, dict)
    assert all(v >= 0.0 for v in result.values())


def test_step_timer_summary():
    timer = StepTimer()
    for _ in range(5):
        timer.start()
        x = jnp.ones((8, 8)) * 2
        timer.stop(x)
    summary = timer.summary(batch_size=4)
    assert summary["steps"] == 5
    assert summary["mean_s"] > 0
    assert summary["frames_per_sec"] > 0


def test_step_timer_context_manager_syncs_outputs():
    # the context-manager API must honor outputs_fn: blocking mode syncs
    # on the step outputs, so the recorded time is device time, not
    # async dispatch latency (outputs_fn used to be silently ignored)
    timer = StepTimer(blocking=True)
    out = {}
    with timer.step(lambda: out["x"]):
        out["x"] = jnp.ones((256, 256)) @ jnp.ones((256, 256))
    assert len(timer.samples) == 1 and timer.samples[0] > 0
    # and the no-outputs form still works
    with timer.step():
        jnp.ones((8,))
    assert len(timer.samples) == 2


def test_profiler_trace_smoke(tmp_path):
    with trace(str(tmp_path)):
        with annotate("unit"):
            jax.block_until_ready(jnp.ones((16, 16)) @ jnp.ones((16, 16)))
    # trace files written
    assert any(os.scandir(str(tmp_path)))


def test_normalize_roundtrip():
    img = np.random.default_rng(0).uniform(0, 1, (8, 8, 3)).astype(np.float32)
    np.testing.assert_allclose(
        unnormalize_image(normalize_image(img)), img, atol=1e-6
    )


def test_load_image_uint8_matches_float(tmp_path):
    from PIL import Image

    arr = (np.random.default_rng(0).uniform(0, 255, (10, 12, 3))).astype(np.uint8)
    path = str(tmp_path / "img.png")
    Image.fromarray(arr).save(path)
    u8, h, w = load_image_uint8(path)
    f32, h2, w2 = load_image(path, normalize=False)
    assert (h, w) == (h2, w2) == (10, 12)
    np.testing.assert_allclose(u8.astype(np.float32) / 255.0, f32, atol=1e-6)


def test_visualization_outputs(tmp_path):
    rng = np.random.default_rng(0)
    tgt = rng.uniform(-1, 1, (12, 16, 3)).astype(np.float32)
    depth = rng.uniform(1, 50, (12, 16)).astype(np.float32)
    vis = depth_to_image(depth)
    assert vis.shape == (12, 16, 3) and vis.dtype == np.uint8
    img8 = image_to_uint8(tgt)
    assert img8.dtype == np.uint8
    paths = save_warp_visualization(str(tmp_path), 3, tgt, tgt, depth)
    for p in paths.values():
        assert os.path.exists(p)


def test_trainer_sigint_checkpoints(tmp_path):
    import signal

    from unsupervised_pseuso_lidar_tpu.data.synthetic import SyntheticTripletDataset
    from unsupervised_pseuso_lidar_tpu.train.config import Config
    from unsupervised_pseuso_lidar_tpu.train.trainer import Trainer

    config = Config.from_dict(
        {
            "model": {"depth": {"name": "StnDispNet"}, "pose": {"name": "PoseNet"}},
            "datasets": {"augmentation": {"image_width": 32, "image_height": 32}},
            "action": {
                "batch_size": 1,
                "num_epochs": 5,
                "checkpoint_dir": str(tmp_path),
            },
        }
    )
    dataset = SyntheticTripletDataset(1, 1, 32, 32)
    trainer = Trainer(config, dataset=dataset)

    calls = {"n": 0}
    original_run = trainer.run_epoch

    def run_and_interrupt(batches):
        calls["n"] += 1
        result = original_run(batches)
        os.kill(os.getpid(), signal.SIGINT)  # caught by fit's handler
        return result

    trainer.run_epoch = run_and_interrupt
    trainer.fit(make_train_iter=dataset.batches)
    # interrupted after the first epoch, checkpoint written, loop stopped
    assert calls["n"] == 1
    assert trainer.checkpoints.latest_epoch() == 0
