"""Tuner, checks, files, autobackend, distillation, o2m depth aggregation."""

import numpy as np
import pytest


def test_tuner_improves_over_iterations(tmp_path):
    from yolov10_3d_tpu.engine.tuner import Tuner

    # toy objective: fitness peaks at lr0=0.01, mosaic=0.8
    def train_fn(hyp):
        return -abs(np.log10(hyp["lr0"]) + 2) - abs(hyp["mosaic"] - 0.8)

    tuner = Tuner(train_fn, save_dir=str(tmp_path), seed=0)
    best_hyp, best_fit = tuner(iterations=25)
    first_fit = tuner.results[0][0]
    assert best_fit >= first_fit
    assert (tmp_path / "tune_results.csv").exists()


def test_check_imgsz():
    from yolov10_3d_tpu.utils.checks import check_imgsz

    assert check_imgsz(640) == 640
    with pytest.warns(UserWarning):
        assert check_imgsz(100) == 128
    assert check_imgsz([960, 640]) == [960, 640]
    with pytest.raises(ValueError):
        check_imgsz(0)


def test_check_amp():
    from yolov10_3d_tpu.utils.checks import check_amp

    assert check_amp() is True


def test_increment_path(tmp_path):
    from yolov10_3d_tpu.utils.files import increment_path

    p = tmp_path / "exp"
    p.mkdir()
    p2 = increment_path(p)
    assert p2.name == "exp2"


def test_autobackend_ckpt(tmp_path):
    import jax

    from yolov10_3d_tpu.nn.autobackend import AutoBackend
    from yolov10_3d_tpu.nn.build import build_model
    from yolov10_3d_tpu.utils.checkpoint import save_checkpoint
    from _helpers import build_jax

    model, spec, variables = build_jax("n")
    save_checkpoint(
        tmp_path / "m.ckpt",
        params=jax.device_get(variables["params"]),
        batch_stats=jax.device_get(variables["batch_stats"]),
        meta={"model_yaml": "yolov10n.yaml", "nc": 80},
    )
    backend = AutoBackend(str(tmp_path / "m.ckpt"))
    boxes, scores, labels = backend.forward(np.zeros((1, 64, 64, 3), np.float32))
    assert boxes.shape == (1, 300, 4)
    with pytest.raises(ValueError):
        AutoBackend("weights.engine")  # TensorRT: genuinely unsupported


def test_o2m_depth_aggregation():
    from yolov10_3d_tpu.engine.validator3d import aggregate_o2m_depth

    # one o2o det at depth 30 with high uncertainty; five o2m clones at ~20
    # with low uncertainty -> aggregated depth moves toward 20
    K = 37
    predsO = np.zeros((1, 1, K), np.float32)
    predsO[0, 0, :4] = [100, 100, 200, 200]
    predsO[0, 0, 33] = 30.0
    predsO[0, 0, 34] = 2.0  # sigma = exp(-2) ~ 0.13
    predsO[0, 0, 36] = 1
    predsM = np.zeros((1, 5, K), np.float32)
    for j in range(5):
        predsM[0, j, :4] = [100, 100, 200, 200]
        predsM[0, j, 33] = 20.0 + 0.1 * j
        predsM[0, j, 34] = 0.1
        predsM[0, j, 36] = 1
    out = aggregate_o2m_depth(predsO, predsM)
    assert 19.5 < out[0, 0, 33] < 22.0, out[0, 0, 33]


def test_distill_losses():
    import jax.numpy as jnp

    from yolov10_3d_tpu.train.distill import supervision_fgdm_loss, supervision_head_loss

    rng = np.random.default_rng(0)
    B, A, C, M = 2, 64, 16, 4
    teacher = jnp.asarray(rng.standard_normal((B, 12, 40, C)).astype(np.float32))
    pred = jnp.asarray(rng.standard_normal((B, A, C)).astype(np.float32))
    c3d = jnp.asarray(rng.uniform(0, 300, (B, M, 2)).astype(np.float32))
    tgi = jnp.zeros((B, A), jnp.int32)
    fg = jnp.zeros((B, A), bool).at[:, :5].set(True)
    mask_gt = jnp.ones((B, M), bool)
    mixed = jnp.array([False, True])
    for crit in ("soft", "mse", "cos"):
        loss = supervision_head_loss(
            teacher, pred, c3d, tgi, fg, mask_gt, mixed, (96, 320), criterion=crit
        )
        assert np.isfinite(float(loss)) and float(loss) >= 0

    fgdm_emb = jnp.asarray(rng.standard_normal((B, 24, 80, C)).astype(np.float32))
    dmaps = jnp.asarray((rng.uniform(0, 1, (B, 96, 320)) > 0.7).astype(np.float32) * 20)
    loss = supervision_fgdm_loss(teacher, fgdm_emb, dmaps)
    assert np.isfinite(float(loss))


def test_o2m_depth_aggregation_matches_sklearn_loop():
    """The vectorized grid-KDE must reproduce the per-detection sklearn
    KernelDensity loop (the reference algorithm, val.py:78-102)."""
    from sklearn.neighbors import KernelDensity

    from yolov10_3d_tpu.engine.validator3d import aggregate_o2m_depth
    from yolov10_3d_tpu.utils.metrics import box_iou_np

    rng = np.random.default_rng(3)
    K, B, N, M = 37, 2, 8, 24
    def rand_preds(n):
        p = np.zeros((B, n, K), np.float64)
        xy = rng.uniform(50, 250, (B, n, 2))
        wh = rng.uniform(30, 60, (B, n, 2))
        p[..., :2] = xy - wh / 2
        p[..., 2:4] = xy + wh / 2
        p[..., 33] = rng.uniform(10, 40, (B, n))
        p[..., 34] = rng.uniform(0.0, 2.5, (B, n))
        p[..., 36] = rng.integers(0, 3, (B, n))
        return p
    predsO, predsM = rand_preds(N), rand_preds(M)
    # plant clusters so some rows actually aggregate
    for i in range(B):
        for j in range(0, N, 2):
            for k in range(j * 2, min(j * 2 + 3, M)):
                predsM[i, k, :4] = predsO[i, j, :4]
                predsM[i, k, 36] = predsO[i, j, 36]
                predsM[i, k, 33] = predsO[i, j, 33] + rng.normal(0, 2)
                predsM[i, k, 34] = 0.2

    expected = predsO.copy()
    for i in range(B):
        iou = box_iou_np(predsO[i, :, :4], predsM[i, :, :4])
        for j in range(N):
            matches = iou[j] > 0.9
            depths = np.concatenate([[predsO[i, j, 33]], predsM[i, matches, 33]])
            uncerts = np.concatenate([[predsO[i, j, 34]], predsM[i, matches, 34]])
            cls = np.concatenate([[predsO[i, j, 36]], predsM[i, matches, 36]])
            scores = np.exp(-uncerts)
            mask = (scores > 0.1) & (cls == predsO[i, j, 36])
            if mask.sum() > 1:
                w, d = scores[mask], depths[mask]
                kde = KernelDensity(bandwidth="silverman", kernel="gaussian").fit(
                    d[:, None], sample_weight=w / w.sum())
                grid = np.linspace(d.min(), d.max(), 500)[:, None]
                expected[i, j, 33] = grid[np.argmax(kde.score_samples(grid)), 0]

    out = aggregate_o2m_depth(predsO, predsM)
    changed = np.abs(expected[..., 33] - predsO[..., 33]) > 1e-12
    assert changed.any()  # the planted clusters aggregated
    np.testing.assert_allclose(out[..., 33], expected[..., 33], rtol=0, atol=1e-9)


def test_model_tune_and_ray_gate(monkeypatch, tmp_path):
    """Model.tune evolution wiring + ray-gated path (reference engine/model.py
    ``tune``, utils/tuner.py ``run_ray_tune``)."""
    from yolov10_3d_tpu.engine.model import YOLOv10

    m = YOLOv10("yolov10n.yaml")

    class _T:
        best_fitness = 0.0

    def fake_train(self=m, **kw):
        t = _T()
        t.best_fitness = 1.0 - abs(kw.get("lr0", 0.01) - 0.02)
        m.trainer = t

    monkeypatch.setattr(m, "train", fake_train)
    best_hyp, best_fit = m.tune(iterations=4, save_dir=str(tmp_path))
    assert best_fit > 0 and "lr0" in best_hyp

    try:
        import ray  # noqa: F401
        has_ray = True
    except ImportError:
        has_ray = False
    if not has_ray:
        with pytest.raises(RuntimeError, match="ray"):
            m.tune(use_ray=True)


def test_integration_registry_has_new_adapters():
    from yolov10_3d_tpu.utils.callbacks import _INTEGRATIONS

    for key in ("clearml", "neptune", "ray", "mlflow", "wandb"):
        assert key in _INTEGRATIONS


def test_benchmark_formats_table(tmp_path):
    """Format benchmark table exports, reloads and times every Exporter
    format (reference benchmarks.py:44)."""
    pytest.importorskip("tensorflow")
    from yolov10_3d_tpu.engine.model import YOLOv10
    from yolov10_3d_tpu.utils.benchmarks import benchmark_formats

    m = YOLOv10("yolov10n.yaml")
    rows = benchmark_formats(m, imgsz=64, out_dir=str(tmp_path))
    by_fmt = {r["format"]: r for r in rows}
    assert set(by_fmt) == {
        "ckpt", "stablehlo", "tf_saved_model", "tflite", "tflite-fp16",
        "tflite-int8", "pb", "onnx"
    }
    for fmt, r in by_fmt.items():
        assert r["status"] == "✅", (fmt, r.get("error"))
        assert r["latency_ms"] > 0 and r["size_mb"] > 0
    assert by_fmt["stablehlo"]["match"] and by_fmt["tf_saved_model"]["match"]
    assert by_fmt["pb"]["match"] and by_fmt["onnx"]["match"]
    # quantized artifacts must actually shrink
    assert by_fmt["tflite-int8"]["size_mb"] < 0.4 * by_fmt["tflite"]["size_mb"]
    assert by_fmt["tflite-fp16"]["size_mb"] < 0.6 * by_fmt["tflite"]["size_mb"]


def test_profile_models_and_sigma_clipping():
    from yolov10_3d_tpu.utils.benchmarks import ProfileModels, iterative_sigma_clipping

    data = np.array([1.0, 1.1, 0.9, 1.05, 1.0, 0.95, 100.0])
    clipped = iterative_sigma_clipping(data)
    assert 100.0 not in clipped and len(clipped) >= 3

    rows = ProfileModels(
        ["yolov10_3d_tpu/cfg/models/v10/yolov10n.yaml"], imgsz=64, iters=2
    ).profile()
    assert rows[0]["params_M"] > 1 and rows[0]["latency_ms"] > 0


def test_htl_state_roundtrip_and_inf_guard():
    """HTL ramp state survives checkpoint round-trip; overflowed weights
    zero instead of absorbing the budget (review findings)."""
    from yolov10_3d_tpu.train.htl import ITEM_KEYS, HierarchicalTaskLearning

    h = HierarchicalTaskLearning(stat_epoch_nums=5, max_epochs=50)
    rng = np.random.default_rng(0)
    for e in range(7):
        h.compute_weight(rng.uniform(0.5, 2.0, len(ITEM_KEYS)), e)
    d = h.state_dict()
    h2 = HierarchicalTaskLearning(stat_epoch_nums=5, max_epochs=50)
    h2.load_state_dict(d)
    v = rng.uniform(0.5, 2.0, len(ITEM_KEYS))
    np.testing.assert_allclose(
        h.compute_weight(v.copy(), 7), h2.compute_weight(v.copy(), 7)
    )

    # inf guard: forge a state that overflows time_value ** (1 - control)
    h3 = HierarchicalTaskLearning(stat_epoch_nums=5, max_epochs=1000)
    h3.past_losses = [np.full(len(ITEM_KEYS), 10.0 - 2.0 * i) for i in range(5)]
    h3.init_diff = np.full(len(ITEM_KEYS), 1e-12)  # ratio explodes
    w = h3.compute_weight(np.ones(len(ITEM_KEYS)), 6)
    assert np.all(np.isfinite(w)) and w.max() < 7.0
