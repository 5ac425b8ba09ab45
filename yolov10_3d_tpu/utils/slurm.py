"""SLURM experiment launcher (reference: run.py — per-experiment code
snapshot, sbatch templating with [JOB_NAME]/[CODE_DIR]/[RESULTS_DIR],
running-jobs JSON tracking).

TPU-cluster oriented: the template typically requests TPU slices instead of
GPUs, but the mechanics (snapshot, template, submit, track) are identical.
Everything except `sbatch` submission works without a SLURM installation.
"""

from __future__ import annotations

import json
import shutil
import subprocess
import time
from pathlib import Path
from typing import List, Optional, Tuple

PLACEHOLDERS = ("[JOB_NAME]", "[CODE_DIR]", "[RESULTS_DIR]")


class SlurmLauncher:
    def __init__(self, exp_dir: str, code_dir: str, results_dir: str):
        self.exp_dir = Path(exp_dir)
        self.code_dir = Path(code_dir)
        self.results_dir = Path(results_dir)
        self.tmp_sbatch = self.exp_dir / "tmp_sbatch"
        self.jobs_file = self.exp_dir / "running_jobs.json"
        for d in (self.exp_dir, self.code_dir, self.results_dir, self.tmp_sbatch):
            d.mkdir(parents=True, exist_ok=True)

    # -- job tracking -------------------------------------------------------
    def running_jobs(self) -> List[Tuple[str, str]]:
        if not self.jobs_file.exists():
            return []
        jobs = json.loads(self.jobs_file.read_text())
        if shutil.which("squeue"):
            try:
                out = subprocess.run(
                    ["squeue", "-h", "-o", "%i"], capture_output=True,
                    text=True, timeout=30,
                ).stdout.split()
                jobs = [(i, n) for i, n in jobs if i in out]
                self.jobs_file.write_text(json.dumps(jobs))
            except (OSError, subprocess.SubprocessError):
                pass
        return [tuple(j) for j in jobs]

    def _append_job(self, job_id: str, name: str):
        jobs = self.running_jobs()
        jobs.append((job_id, name))
        self.jobs_file.write_text(json.dumps(jobs))

    # -- templating ---------------------------------------------------------
    def create_sbatch(self, name: str, template: str) -> Path:
        """Fill the placeholders; refuses templates missing them
        (reference run.py:104-124)."""
        text = Path(template).read_text()
        for ph in PLACEHOLDERS[:2]:
            if ph not in text:
                raise ValueError(f"sbatch template missing {ph}")
        text = (
            text.replace("[JOB_NAME]", name)
            .replace("[CODE_DIR]", str(self.code_dir / name))
            .replace("[RESULTS_DIR]", str(self.results_dir / name))
        )
        fname = self.tmp_sbatch / (
            time.strftime("%Y_%m_%d_%H_%M_%S_") + name + ".sbatch"
        )
        fname.write_text(text)
        return fname

    def snapshot_code(self, name: str, sources: List[str], overwrite: bool = False):
        """Copy the source tree into a per-experiment dir so queued jobs are
        immune to later edits (reference run.py:165-174)."""
        dst = self.code_dir / name
        if dst.exists():
            if not overwrite:
                raise FileExistsError(f"experiment {name!r} already snapshotted")
            shutil.rmtree(dst)
        dst.mkdir(parents=True)
        for src in sources:
            s = Path(src)
            tgt = dst / s.name
            if s.is_dir():
                shutil.copytree(s, tgt, ignore=shutil.ignore_patterns(
                    "__pycache__", "*.pyc", ".git", "runs"))
            else:
                shutil.copy2(s, tgt)
        return dst

    # -- submission ----------------------------------------------------------
    def run_experiment(
        self,
        name: str,
        template: str,
        sources: List[str],
        overwrite: bool = False,
        resume: bool = False,
    ) -> Optional[str]:
        """Snapshot + template + submit; returns the SLURM job id, or the
        sbatch path (as str) when no `sbatch` binary exists (dry mode)."""
        for job_id, running in self.running_jobs():
            if running == name:
                raise RuntimeError(f"job {name!r} already running as {job_id}")
        if not resume or overwrite:
            self.snapshot_code(name, sources, overwrite=overwrite)
        (self.results_dir / name).mkdir(parents=True, exist_ok=True)
        script = self.create_sbatch(name, template)
        if shutil.which("sbatch") is None:
            return str(script)
        out = subprocess.run(
            ["sbatch", str(script)], capture_output=True, text=True, timeout=60
        ).stdout
        job_id = out.strip().rsplit(" ", 1)[-1]
        self._append_job(job_id, name)
        return job_id
