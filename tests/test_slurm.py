"""SLURM launcher: templating, code snapshot, dry-run submission."""

from pathlib import Path

import pytest

from yolov10_3d_tpu.utils.slurm import SlurmLauncher

TEMPLATE = """#!/bin/bash
#SBATCH --job-name=[JOB_NAME]
#SBATCH --output=[RESULTS_DIR]/%j.out
cd [CODE_DIR]
python -m yolov10_3d_tpu train
"""


def test_run_experiment_dry(tmp_path):
    (tmp_path / "tmpl.sbatch").write_text(TEMPLATE)
    src = tmp_path / "srcpkg"
    src.mkdir()
    (src / "main.py").write_text("print('hi')")

    launcher = SlurmLauncher(tmp_path / "exp", tmp_path / "code", tmp_path / "res")
    out = launcher.run_experiment("expA", str(tmp_path / "tmpl.sbatch"), [str(src)])
    # no sbatch binary in this image -> dry mode returns the script path
    script = Path(out)
    text = script.read_text()
    assert "--job-name=expA" in text
    assert str(tmp_path / "code" / "expA") in text
    assert str(tmp_path / "res" / "expA") in text
    assert (tmp_path / "code" / "expA" / "srcpkg" / "main.py").exists()

    # duplicate snapshot refused without overwrite
    with pytest.raises(FileExistsError):
        launcher.snapshot_code("expA", [str(src)])
    launcher.snapshot_code("expA", [str(src)], overwrite=True)


def test_template_validation(tmp_path):
    (tmp_path / "bad.sbatch").write_text("#!/bin/bash\necho no placeholders\n")
    launcher = SlurmLauncher(tmp_path / "e", tmp_path / "c", tmp_path / "r")
    with pytest.raises(ValueError, match="JOB_NAME"):
        launcher.create_sbatch("x", str(tmp_path / "bad.sbatch"))
