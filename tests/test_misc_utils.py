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
        AutoBackend("weights.onnx")


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
