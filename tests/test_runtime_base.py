"""Runtime base (reference utils/__init__.py): LOGGER, colorstr, yaml io,
SettingsManager persistence, resilience decorators, strip_optimizer."""

import logging
from pathlib import Path

import numpy as np
import pytest


def test_logger_and_colorstr(caplog):
    from yolov10_3d_tpu.utils import LOGGER, colorstr

    assert isinstance(LOGGER, logging.Logger)
    s = colorstr("blue", "bold", "hello")
    assert "hello" in s and s.startswith("\033[")
    assert colorstr("plain") .endswith("\033[0m")


def test_yaml_io(tmp_path):
    from yolov10_3d_tpu.utils import yaml_load, yaml_save

    d = {"a": 1, "b": [1, 2], "c": "x", "p": Path("/tmp/x")}
    f = tmp_path / "t.yaml"
    yaml_save(f, d, header="# hdr\n")
    back = yaml_load(f)
    assert back["a"] == 1 and back["b"] == [1, 2] and back["p"] == "/tmp/x"
    assert yaml_load(f, append_filename=True)["yaml_file"] == str(f)


def test_settings_manager(tmp_path):
    from yolov10_3d_tpu.utils import SettingsManager

    f = tmp_path / "settings.json"
    s = SettingsManager(file=f)
    s["tensorboard"] = False
    s.save()
    assert f.exists()
    s2 = SettingsManager(file=f)
    assert s2["tensorboard"] is False
    s2.reset()
    assert SettingsManager(file=f)["tensorboard"] is True
    # schema drift -> merged reset, not crash
    f.write_text('{"settings_version": "0.0.1", "bogus": 1, "wandb": true}')
    s3 = SettingsManager(file=f)
    assert s3["wandb"] is True and "bogus" not in s3


def test_decorators():
    from yolov10_3d_tpu.utils import Retry, TryExcept

    calls = []

    @TryExcept("msg")
    def boom():
        calls.append(1)
        raise RuntimeError("x")

    boom()  # swallowed
    assert calls == [1]

    n = {"v": 0}

    @Retry(times=2, delay=0.0)
    def flaky():
        n["v"] += 1
        if n["v"] < 3:
            raise ValueError("again")
        return "ok"

    assert flaky() == "ok" and n["v"] == 3


def test_strip_optimizer(tmp_path):
    from yolov10_3d_tpu.utils.checkpoint import (
        load_checkpoint, save_checkpoint, strip_optimizer,
    )

    p = tmp_path / "w.ckpt"
    params = {"conv": {"kernel": np.ones((3, 3, 8, 8), np.float32)}}
    ema = {"conv": {"kernel": np.full((3, 3, 8, 8), 2.0, np.float32)}}
    save_checkpoint(
        p, params=params, ema_params=ema,
        opt_state={"mu": {"conv": {"kernel": np.zeros((3, 3, 8, 8), np.float32)}}},
        meta={"epoch": 5},
    )
    before = p.stat().st_size
    strip_optimizer(p)
    after = p.stat().st_size
    assert after < before / 2
    ckpt = load_checkpoint(p)
    # EMA promoted to params, halved, optimizer dropped
    assert ckpt["params"]["conv"]["kernel"].dtype == np.float16
    assert float(ckpt["params"]["conv"]["kernel"][0, 0, 0, 0]) == 2.0
    assert not ckpt["opt_state"] and not ckpt["ema_params"]
    assert ckpt["meta"]["stripped"] is True and ckpt["meta"]["epoch"] == 5
